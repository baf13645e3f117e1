package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Decomposes join_fuzzy_levenshtein's cost: candidate-pair
  * enumeration (the blocked self-join) vs the threshold-DP pass, and
  * measures the char-count bag-distance prefilter (a per-pair O(26)
  * lower bound that must reject a pair before the O(k·n) DP runs).
  * Usage: runMain graft.tools.FuzzyProbe [sfDir] [enum]
  * ("enum" re-times the pair-enumeration forms — minutes at sf1;
  * without it only the segment/collapsed sections run).
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runEnum = args.lift(1).contains("enum")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // graft extensions OFF: with them on, ReplaceLevenshtein rewrites
    // the built-in threshold form into the Myers kernel and the probe
    // would benchmark the kernel against itself
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).config("spark.sql.extensions", "").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p = Tables.part(spark, sfDir).select(
      col("p_partkey"), col("p_brand"), col("p_name"),
      length(col("p_name")).as("_len"))
    println(s"parts=${p.count()}")

    val pairs = p.alias("l").join(p.alias("r"),
      col("l.p_brand") === col("r.p_brand") &&
        col("l._len") === col("r._len") &&
        col("l.p_partkey") < col("r.p_partkey"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    if (runEnum) {
      println(s"candidate_pairs=${pairs.count()}")

      time("pair enumeration only") { pairs }

      time("pairs + threshold DP") {
        pairs.withColumn("dist",
            levenshtein(col("l.p_name"), col("r.p_name"), 2).cast("long"))
          .filter(col("dist") >= 0)
      }

      // rejected alternative, kept for the record: a bag-distance
      // prefilter via higher-order functions (transform/zip_with/
      // aggregate) measured 18 s — the lambdas run interpreted and
      // allocate per pair, 10× WORSE than just running the DP.
      time("pairs + bit-parallel Myers") {
        pairs.withColumn("dist",
            graft.functions.EditDistance.levWithin(
              col("l.p_name"), col("r.p_name"), 2).cast("long"))
          .filter(col("dist") >= 0)
      }
    }

    val full = Tables.part(spark, sfDir)
    val segBlock = Seq(col("p_brand"), length(col("p_name")))
    if (runEnum) {
      // segment-index (PassJoin) decomposition: how many candidate
      // pairs do segment collisions actually generate, and what does
      // the end-to-end equi-join form cost vs the block-quadratic one?
      val cand = graft.ops.FuzzyJoin.candidatePairs(
        full, col("p_partkey"), col("p_name"), segBlock, 2)
      println(s"segment_candidates=${cand.count()}")
      println(s"segment_candidates_distinct=${cand.distinct().count()}")
      time("segment index end-to-end") {
        graft.ops.FuzzyJoin.selfJoin(full, col("p_partkey"), col("p_name"),
          block = segBlock, k = 2)
      }
    }

    // collapsed form: verify once per distinct (block, text) pair,
    // expand back by key — the winner when texts repeat
    val (_, d, tp, out) = graft.ops.FuzzyJoin.collapsedStages(full,
      col("p_partkey"), col("p_name"), segBlock, 2)
    println(s"collapsed_distinct_texts=${d.count()}")
    println(s"collapsed_text_pairs=${tp.count()}")
    println(s"collapsed_output_pairs=${out.count()}")
    time("collapsed-distinct end-to-end") {
      graft.ops.FuzzyJoin.selfJoinCollapsed(full, col("p_partkey"),
        col("p_name"), block = segBlock, k = 2)
    }

    spark.stop()
  }
}
