package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** Evidence probe for the recall-adaptive IVF-PQ probe
  * ([[graft.ops.Similarity.ivfPqIndexedTopKAdaptive]]): builds the
  * `ext_sim_ivfpq_indexed` index configuration (nlist=16, m=8,
  * ksub=64 over the full corpus) and records, for a candidate
  * (nprobe0, nprobeMax, margin), the table the r9 verdict asked for:
  * per-query hit floors against the exact top-10 (narrow-fixed vs
  * adaptive vs wide-fixed), the EXACT escalation fraction (the same
  * [[graft.ops.Similarity.adaptiveEscalations]] set the query path
  * acts on), and interleaved best-of-2 WALL seconds for all three
  * probes — so "adaptive is cheaper than fixed-wide at the same
  * floor" is a measured statement per fixture, not an asserted one.
  *
  * `margin = auto` runs [[graft.ops.Similarity.calibrateAdaptiveMargin]]
  * on a bounded 256-query sample on a mostly-disjoint stride from
  * the probe queries (%97 vs %50 intersect every 4850 ids) and
  * reports the calibrated value — the configuration the catalog
  * entry `ext_sim_ivfpq_adaptive` ships.
  *
  * The fixture argument accepts either a testdata dir (uniform
  * embeddings) or `clustered:<n>[:<nClusters>:<noise>:<bgFrac>]`
  * ([[ClusteredFixture]] — the shape real embedding corpora have,
  * where the centroid signal separates and escalation prices only
  * the tail).
  *
  * Usage: runMain graft.tools.AdaptiveProbe <sfDir|clustered:n[:c:noise:bg]>
  *        [nprobe0] [nprobeMax] [margin|auto] [calMinHits] [nlist]
  */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("/root/testdata/sf0.01")
    val p0 = args.lift(1).map(_.toInt).getOrElse(2)
    val pMax = args.lift(2).map(_.toInt).getOrElse(8)
    val marginSpec = args.lift(3).getOrElse("auto")
    val calMinHits = args.lift(4).map(_.toInt).getOrElse(3)
    val nlist = args.lift(5).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = (if (spec.startsWith("clustered:")) {
      val p = spec.stripPrefix("clustered:").split(':')
      ClusteredFixture.frame(spark, p(0).toLong,
        nClusters = p.lift(1).map(_.toInt).getOrElse(50),
        noise = p.lift(2).map(_.toDouble).getOrElse(0.35),
        bgFrac = p.lift(3).map(_.toDouble).getOrElse(0.1))
    } else Tables.embeddings(spark, spec)).localCheckpoint()
    val n = emb.count()
    val rr = math.min(10000L, math.max(100L, n / 25)).toInt
    val qs = emb.filter(col("vec_id") % 50 === 0).localCheckpoint()
    val nq = qs.count()
    val dir = java.nio.file.Files
      .createTempDirectory("adaptive-probe").toString + "/idx"
    Similarity.buildIvfPqIndex(emb, dir, nlist = nlist, m = 8, ksub = 64,
      seed = 42L)
    // calibration sample: bounded, deterministic, a mostly-disjoint
    // stride from the probe queries (%97 vs %50 — CRT makes them
    // intersect every 4850 ids) — the catalog entry's shape
    val cal = emb.filter(col("vec_id") % 97 === 13)
      .orderBy("vec_id").limit(256)
    val margin =
      if (marginSpec == "auto")
        Similarity.calibrateAdaptiveMargin(spark, dir, cal, k = 10,
          nprobe0 = p0, minHits = calMinHits, rerank = rr)
      else marginSpec.toDouble
    println(s"fixture=$spec n=$n queries=$nq rerank=$rr " +
      s"p0=$p0 pMax=$pMax nlist=$nlist margin=$margin (${marginSpec})")

    val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
      .select("q_id", "c_id").localCheckpoint()
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
    def narrow() = Similarity.ivfPqIndexedTopK(spark, dir, qs,
      k = 10, nprobe = p0, rerank = rr)
    def adaptive() = Similarity.ivfPqIndexedTopKAdaptive(spark, dir, qs,
      k = 10, nprobe0 = p0, nprobeMax = pMax, margin = margin, rerank = rr)
    def wide() = Similarity.ivfPqIndexedTopK(spark, dir, qs,
      k = 10, nprobe = pMax, rerank = rr)
    hitStats("narrow", narrow())
    hitStats("adaptive", adaptive())
    hitStats("wide", wide())
    // EXACT escalation set — the decision the query path acts on
    val centroids = Similarity.readIndexCentroids(spark, dir)
    val esc = Similarity.adaptiveEscalations(qs, narrow(), centroids,
      k = 10, p0 = math.min(p0, centroids.length), margin).count()
    println(f"escalated=$esc of $nq (${100.0 * esc / nq}%.1f%%)")
    // offender table: the below-3 adaptive queries with their decision
    // inputs — names WHY a floor miss happened (gap above margin =
    // signal blind spot; escalated-but-still-low = pMax too narrow)
    val adaptRes = adaptive().localCheckpoint()
    val offenders = exact.join(
        adaptRes.select(col("q_id"), col("c_id"), lit(1).as("hit")),
        Seq("q_id", "c_id"), "left")
      .groupBy("q_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      .filter(col("hits") < 3)
    offenders.join(
        Similarity.adaptiveEscalations(qs, narrow(), centroids, 10,
          math.min(p0, centroids.length), margin)
          .withColumn("escalated", lit(true)),
        Seq("q_id"), "left")
      .collect().take(8).foreach { r =>
        println(s"offender q_id=${r.getLong(0)} hits=${r.getLong(1)} " +
          s"escalated=${!r.isNullAt(2)}")
      }
    // interleaved best-of-2 walls (box timings drift; exponents and
    // SAME-RUN ratios are the stable signal)
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    val walls = (1 to 2).map(_ =>
      (time(narrow _), time(adaptive _), time(wide _)))
    val (wn, wa, ww) = (walls.map(_._1).min, walls.map(_._2).min,
      walls.map(_._3).min)
    println(f"wall narrow=$wn%.2fs adaptive=$wa%.2fs wide=$ww%.2fs " +
      f"adaptive/wide=${wa / ww}%.2f")
    // operator-facing recommendation: the once-per-index call a user
    // would make (bounded to the calibration sample; two-point fit
    // separating per-call overhead from marginal per-query cost)
    val advice = Similarity.adviseProbeMode(spark, dir, cal, k = 10,
      nprobe0 = p0, nprobeMax = pMax, minHits = calMinHits, rerank = rr)
    val be = if (advice.breakEvenQueries == Long.MaxValue) "never"
      else advice.breakEvenQueries.toString
    println(f"advice margin=${advice.margin}%.3f " +
      f"escFrac=${advice.escalationFraction}%.3f " +
      f"adaptive=${advice.adaptiveOverhead}%.2fs+${advice.adaptivePerQuery * 1000}%.2fms/q " +
      f"wide=${advice.wideOverhead}%.2fs+${advice.widePerQuery * 1000}%.2fms/q " +
      s"breakEven=$be " +
      s"recommend=${if (advice.recommendAdaptive) "adaptive" else "fixed"}")
    spark.stop()
  }
}
