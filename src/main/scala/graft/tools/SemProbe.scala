package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Dedup

/** Scale probe for the semantic-dedup recall contract (VERDICT r6
  * next #5): measures the PER-LABEL recall floor of the cell-blocked
  * pass (`semanticNearDupPairsAdaptive`) and the hybrid cell+LSH pass
  * (`semanticNearDupPairsHybrid`) against the exact label-blocked
  * near-dup baseline, at one or more thresholds. The baseline is
  * bounded to the fixed `vec_id < 25000` slice exactly like the
  * catalog gate (`ext_dedup_semantic`), so the probe is runnable at
  * any sf; the approximate passes run the FULL corpus.
  *
  * Usage: runMain graft.tools.SemProbe <sfDir> [theta1,theta2,...]
  * Default thresholds: 0.35 (the adversarial low-θ regime, r6 weak
  * #3) and 0.6 (the SemDeDup paper's regime).
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val thetas = args.lift(1).getOrElse("0.35,0.6")
      .split(',').toSeq.map(_.toDouble)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"n=$n nlist=${Dedup.semParams(n)} " +
      s"ann(bands,bits)=${Dedup.annParams(n)}")

    def floors(truePairs: DataFrame, approx: DataFrame): (Double, Long) = {
      val hits = approx.select(col("a_id"), col("b_id"), lit(1).as("hit"))
      val byLabel = truePairs
        .join(emb.select(col("vec_id").as("a_id"), col("label")), "a_id")
        .join(hits, Seq("a_id", "b_id"), "left")
        .groupBy("label")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0))).as("n_found"))
        .select(col("n_true"), (col("n_found") / col("n_true")).as("recall"))
        .collect()
      (byLabel.map(_.getAs[Double]("recall")).min,
        byLabel.map(_.getAs[Long]("n_true")).sum)
    }

    thetas.foreach { theta =>
      val truePairs = Dedup.embeddingNearDups(
        emb.filter(col("vec_id") < 25000L), threshold = theta).persist()
      val nTrue = truePairs.count()
      if (nTrue == 0) {
        println(f"theta=$theta%.2f n_true=0 — no exact pairs at this " +
          "threshold in the bounded slice; recall undefined")
        truePairs.unpersist()
      } else {
      val t0 = System.nanoTime()
      val cells = Dedup.semanticNearDupPairsAdaptive(emb, theta, nassign = 3)
      val (cellFloor, _) = floors(truePairs, cells)
      val tCells = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hybrid = Dedup.semanticNearDupPairsHybrid(emb, theta, nassign = 3)
      val (hybridFloor, _) = floors(truePairs, hybrid)
      val tHybrid = (System.nanoTime() - t1) / 1e9
      // the RECALL-SIZED multi-seed form: L from the banding math so
      // the LSH tier alone targets 0.6 at this θ (L=1 ⇒ same as
      // hybrid, skip the duplicate run)
      val nSeeds = Dedup.semSeedsFor(n, theta)
      val (multiFloor, tMulti) =
        if (nSeeds == 1) (hybridFloor, tHybrid)
        else {
          val t2 = System.nanoTime()
          val multi = Dedup.semanticNearDupPairsHybrid(emb, theta,
            nassign = 3, nSeeds = nSeeds)
          val (f, _) = floors(truePairs, multi)
          (f, (System.nanoTime() - t2) / 1e9)
        }
      println(f"theta=$theta%.2f n_true=$nTrue " +
        f"cells_floor=$cellFloor%.3f (${tCells}%.1f s) " +
        f"hybrid_floor=$hybridFloor%.3f (${tHybrid}%.1f s) " +
        f"multi[L=$nSeeds]_floor=$multiFloor%.3f (${tMulti}%.1f s)")
      truePairs.unpersist()
      }
    }
    spark.stop()
  }
}
