package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** Evidence probe for the recall-adaptive IVF-PQ probe
  * ([[graft.ops.Similarity.ivfPqIndexedTopKAdaptive]]): builds the
  * `ext_sim_ivfpq_indexed` index configuration (nlist=16, m=8,
  * ksub=64 over the full corpus) and prints, for a candidate
  * (nprobe0, nprobeMax, margin), the per-query hit statistics against
  * the exact top-10 — narrow-fixed vs adaptive vs wide-fixed — plus
  * the escalation fraction. The numbers the catalog entry's Scaladoc
  * cites; run at every oracle gate scale before pinning the contract.
  *
  * Usage: runMain graft.tools.AdaptiveProbe <sfDir> [nprobe0] [nprobeMax] [margin]
  */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val p0 = args.lift(1).map(_.toInt).getOrElse(2)
    val pMax = args.lift(2).map(_.toInt).getOrElse(8)
    val margin = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val rr = math.min(10000L, math.max(100L, n / 25)).toInt
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val nq = qs.count()
    val dir = java.nio.file.Files
      .createTempDirectory("adaptive-probe").toString + "/idx"
    Similarity.buildIvfPqIndex(emb, dir, nlist = 16, m = 8, ksub = 64,
      seed = 42L)
    println(s"n=$n queries=$nq rerank=$rr p0=$p0 pMax=$pMax margin=$margin")

    val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
      .select("q_id", "c_id")
    def hitStats(name: String, res: org.apache.spark.sql.DataFrame): Unit = {
      val h = exact.join(
          res.select(col("q_id"), col("c_id"), lit(1).as("hit")),
          Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .agg(min("hits").as("min"), avg("hits").as("avg"),
          sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"))
        .head()
      println(f"$name%-10s minHits=${h.getLong(0)} avgHits=${h.getDouble(1)}%.2f below3=${h.getLong(2)}")
    }
    hitStats("narrow", Similarity.ivfPqIndexedTopK(spark, dir, qs,
      k = 10, nprobe = p0, rerank = rr))
    val adapt = Similarity.ivfPqIndexedTopKAdaptive(spark, dir, qs,
      k = 10, nprobe0 = p0, nprobeMax = pMax, margin = margin, rerank = rr)
      .cache()
    hitStats("adaptive", adapt)
    hitStats("wide", Similarity.ivfPqIndexedTopK(spark, dir, qs,
      k = 10, nprobe = pMax, rerank = rr))
    // escalation fraction: adaptive rows that match the wide result
    // exactly are the escalated queries' (narrow ∩ wide collisions
    // overcount slightly on easy queries — report as an upper bound)
    val wideSet = Similarity.ivfPqIndexedTopK(spark, dir, qs, k = 10,
        nprobe = pMax, rerank = rr)
      .groupBy("q_id").agg(sort_array(collect_list(col("c_id"))).as("w"))
    val adaptSet = adapt
      .groupBy("q_id").agg(sort_array(collect_list(col("c_id"))).as("a"))
    val esc = adaptSet.join(wideSet, "q_id")
      .agg(sum(when(col("a") === col("w"), 1).otherwise(0)).as("escalatedUB"))
      .head().getLong(0)
    println(s"escalated<=${esc} of $nq (upper bound: wide==narrow collisions count)")
    spark.stop()
  }
}
