package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** r14 optimization round: sub-piece wall attribution for the ANN
  * recall-gate catalog shape (probe + brute-force exact baseline +
  * hits join). Each piece runs through the noop sink, best-of-N, so
  * the numbers answer "which third of the entry is the wall" before
  * any change is attempted (guide §1).
  *
  * Usage: runMain graft.tools.OptProbe <sfDir> [attempts]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val attempts = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuneFor(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      sfDir, cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
    def time(name: String)(f: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val walls = (1 to attempts).map { _ =>
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime(); noop(f)
        ((System.nanoTime() - t0) / 1e9, jobs.get, stages.get)
      }
      val best = walls.minBy(_._1)
      println(f"[opt] $name%-34s min=${best._1}%6.3f jobs=${best._2}%3d " +
        f"stages=${best._3}%3d all=" +
        walls.map(w => f"${w._1}%.3f").mkString(","))
    }

    val emb = Tables.embeddings(spark, sfDir)
    val n = Tables.cachedCount(spark, sfDir, "embeddings")
    val rr = math.min(10000L, math.max(100L, n / 25)).toInt
    val qs = emb.filter(col("vec_id") % 50 === 0)
    println(s"[opt] corpus n=$n queries=${qs.count()} rerank=$rr")

    // the exact baseline every recall gate pays
    time("bruteForceTopK")(Similarity.bruteForceTopK(qs, emb, k = 10))

    // persisted IVF-PQ probe pieces (index built once, steady state)
    val idxDir = "/tmp/optprobe_ivfpq"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(idxDir)))
      Similarity.buildIvfPqIndex(emb, idxDir, nlist = 16, m = 8, ksub = 64,
        seed = 42L)
    time("ivfPqIndexedTopK nprobe=6")(
      Similarity.ivfPqIndexedTopK(spark, idxDir, qs, k = 10, nprobe = 6,
        rerank = rr))
    time("ivfPqIndexedTopK nprobe=3")(
      Similarity.ivfPqIndexedTopK(spark, idxDir, qs, k = 10, nprobe = 3,
        rerank = rr))
    val margin = Similarity.calibrateAdaptiveMargin(spark, idxDir,
      emb.filter(col("vec_id") % 97 === 13).orderBy("vec_id").limit(256),
      k = 10, nprobe0 = 3, minHits = 5, rerank = rr)
    time("ivfPqIndexedTopKAdaptive")(
      Similarity.ivfPqIndexedTopKAdaptive(spark, idxDir, qs, k = 10,
        nprobe0 = 3, nprobeMax = 10, margin = margin, rerank = rr))

    // the gate-join tail (hits >= 3) on top of both sides
    time("full gate (probe+bf+join)") {
      val probe = Similarity.ivfPqIndexedTopK(spark, idxDir, qs, k = 10,
          nprobe = 6, rerank = rr)
        .select(col("q_id"), col("c_id"), lit(1).as("hit"))
      Similarity.bruteForceTopK(qs, emb, k = 10)
        .select("q_id", "c_id")
        .join(probe, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .select(col("q_id"), (col("hits") >= 3).as("recall_ok"))
    }
    spark.stop()
  }
}
