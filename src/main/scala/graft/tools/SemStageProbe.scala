package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.{Dedup, Par, Similarity}

/** Stage-level timing of the semantic-dedup hybrid pass
  * ([[Dedup.semanticNearDupPairsHybrid]]) at a given sf — isolates
  * (1) the coarse-quantizer KMeans fit, (2) corpus cell assignment,
  * (3) the in-cell pair scan, (4) the sign-LSH seed, (5) the final
  * distinct, so a wall-clock number like the sf25 sweep's 118 s can
  * be attributed to a stage instead of guessed at.
  *
  * Usage: runMain graft.tools.SemStageProbe <sfDir> [theta]
  */
object SemStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val nlist = Dedup.semParams(n)
    println(s"n=$n nlist=$nlist ann=${Dedup.annParams(n)}")

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    def run(name: String)(df: => DataFrame): Unit =
      t(name)(df.write.mode("overwrite").format("noop").save())

    Similarity.clearIvfIndexCache()
    val centroids = t("kmeans fit (cold)")(
      Similarity.ivfCentroids(emb, nlist, 42L))
    run("cell assignment")(
      Similarity.ivfProbeSide(Par.spread(emb), centroids, 3))
    run("in-cell pairs (warm fit)")(
      Dedup.semanticNearDupPairsAdaptive(emb, theta, nassign = 3))
    run("lsh seed pass")(
      Dedup.embeddingNearDupsAnnAdaptive(emb, theta))
    run("hybrid total (warm fit)")(
      Dedup.semanticNearDupPairsHybrid(emb, theta, nassign = 3))
    // the RECALL-CONTRACT configuration (bench_dedup_semantic_rc_fq):
    // L = semSeedsFor seeds fused into one LSH pass, plus the cell tier
    val l = Dedup.semSeedsFor(n, theta)
    val (bands, bits) = Dedup.annParams(n)
    run(s"lsh fused x$l")(
      Dedup.embeddingNearDupsAnnSeeds(emb, theta, bands, bits,
        (0 until l).map(i => 42L + 1000L * i), dedup = false))
    run(s"hybrid rc total (L=$l)")(
      Dedup.semanticNearDupPairsHybrid(emb, theta, nassign = 3,
        nSeeds = l, n = n))
    spark.stop()
  }
}
