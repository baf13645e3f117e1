package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.TopK

/** Measures the claim in [[graft.ops.TopK]]: bounded-buffer top-k vs
  * the window row_number form, identical data and k. The win grows
  * with group size (the window sorts whole groups; the aggregator
  * never holds more than k rows per key per partition), so the probe
  * uses the low-cardinality (event_type) grouping where groups are
  * ~sf·2M rows. Usage: runMain graft.tools.TopKProbe [sfDir]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.eventsRaw(spark, sfDir).select("event_type", "value", "event_id")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    time("events: window row_number k=5") {
      ev.withColumn("rnk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("value").desc, col("event_id"))).cast("long"))
        .filter(col("rnk") <= 5)
    }
    time("events: typed Aggregator k=5") {
      TopK.topKPerGroupTyped(ev, "event_type", "value", "event_id", k = 5)
    }
    time("events: native TopKPairsAgg k=5") {
      TopK.topKPerGroup(ev, "event_type", "value", "event_id", k = 5)
    }

    // where the design matters: 20M rows in 8 groups — the window
    // form sorts 2.5M-row groups; the aggregator's partials never
    // exceed k rows per key per partition
    val big = spark.range(20000000L).select(
      concat(lit("g"), (col("id") % 8).cast("string")).as("g"),
      (hash(col("id")).cast("double") / 1e9).as("v"),
      col("id"))
    time("20M×8grp: window row_number k=5") {
      big.withColumn("rnk", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("v").desc, col("id"))).cast("long"))
        .filter(col("rnk") <= 5)
    }
    time("20M×8grp: typed Aggregator k=5") {
      TopK.topKPerGroupTyped(big, "g", "v", "id", k = 5)
    }
    time("20M×8grp: native TopKPairsAgg k=5") {
      TopK.topKPerGroup(big, "g", "v", "id", k = 5)
    }
    spark.stop()
  }
}
