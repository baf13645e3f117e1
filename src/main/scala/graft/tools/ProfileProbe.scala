package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}

/** Timing probe for the column-profiler shapes and the fuzzy join:
  * (A) one agg with 5 exact count_distincts (Catalyst Expand ×6),
  * (B) union of 5 per-column aggregations (each its own 2-stage
  *     distinct, scans stay single-column thanks to pruning),
  * plus the threshold-vs-full levenshtein variants.
  * Usage: runMain graft.tools.ProfileProbe <sfDir>
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("profiler A (expand)")(SparkEntry.queries("ext_profile_columns")(spark, sfDir))

    def colProfile(c: String, numExpr: DataFrame => (org.apache.spark.sql.Column, org.apache.spark.sql.Column),
                   strCol: Boolean): DataFrame = {
      val o = Tables.orders(spark, sfDir)
      val (mn, mx) = numExpr(o)
      o.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("ndv"),
        mn.as("min_num"), mx.as("max_num"),
        (if (strCol) min(col(c)) else lit(null).cast("string")).as("min_str"),
        (if (strCol) max(col(c)) else lit(null).cast("string")).as("max_str"))
        .select(lit(c).as("col"), col("n"), col("n_null"), col("ndv"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    def b: DataFrame = {
      val nul = (_: DataFrame) => (lit(null).cast("long"), lit(null).cast("long"))
      Seq(
        colProfile("o_orderkey", _ => (min(col("o_orderkey")), max(col("o_orderkey"))), strCol = false),
        colProfile("o_totalprice", _ => (
          min(floor(col("o_totalprice") * 1000000.0).cast("long")),
          max(floor(col("o_totalprice") * 1000000.0).cast("long"))), strCol = false),
        colProfile("o_orderdate", _ => (
          unix_millis(min(col("o_orderdate")).cast("timestamp")),
          unix_millis(max(col("o_orderdate")).cast("timestamp"))), strCol = false),
        colProfile("o_orderstatus", nul, strCol = true),
        colProfile("o_orderpriority", nul, strCol = true),
      ).reduce(_ unionAll _)
    }
    time("profiler B (5-agg union)")(b)

    time("fuzzy (catalog)")(SparkEntry.queries("join_fuzzy_levenshtein")(spark, sfDir))
    time("fuzzy (segment index)")({
      val pp = Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"), col("p_name"),
          length(col("p_name")).as("_len"))
      graft.ops.FuzzyJoin.selfJoin(pp, col("p_partkey"), col("p_name"),
        Seq(col("p_brand"), col("_len")), k = 2)
    })
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        length(col("p_name")).as("_len"))
    time("fuzzy (full lev)")(
      p.alias("l").join(p.alias("r"),
          col("l.p_brand") === col("r.p_brand") &&
            col("l._len") === col("r._len") &&
            col("l.p_partkey") < col("r.p_partkey"))
        .withColumn("dist", levenshtein(col("l.p_name"), col("r.p_name")).cast("long"))
        .filter(col("dist") <= 2)
        .select(col("l.p_partkey").as("a_key"), col("r.p_partkey").as("b_key"), col("dist")))

    spark.stop()
  }
}
