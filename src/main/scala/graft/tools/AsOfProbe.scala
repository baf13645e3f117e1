package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.AsOfJoin

/** Ad-hoc timing: union-window as-of join vs the whole-operator
  * sorted-merge path (`plans.AsOfJoinExec`), including the
  * pre-partitioned case where the native form's ClusteredDistribution
  * reuses the input partitioning and the union form cannot.
  * Synthesizes rows/keys from `spark.range` so the probe scales
  * independently of the fixtures.
  * Usage: runMain graft.tools.AsOfProbe [nLeft] [nRight] [nKeys]
  */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val nLeft = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val nRight = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val nKeys = args.lift(2).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic scatter: key and time both from a multiplicative
    // hash of the row id, payload a couple of cheap columns
    def events(n: Long, salt: Long): DataFrame = spark.range(n)
      .withColumn("user_id", pmod(col("id") * 2654435761L + salt, lit(nKeys)))
      .withColumn("ts_ms", pmod(col("id") * 1103515245L + salt * 7L, lit(1000000000L)))
    val left = events(nLeft, 1L)
      .select(col("id").as("event_id"), col("user_id"), col("ts_ms"))
    val right = events(nRight, 2L)
      .select(col("user_id"), col("ts_ms"), col("id").as("event_id"),
        (col("id") % 1000).cast("double").as("click_value"))

    def time(name: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val keys = Seq("user_id")
    time("union-window     ")(AsOfJoin.backward(left, right, keys,
      "ts_ms", "ts_ms", Seq("click_value"), "event_id"))
    time("native merge     ")(AsOfJoin.native(left, right, keys,
      "ts_ms", "ts_ms", Seq("click_value"), "event_id"))
    // pre-partitioned inputs: native reuses both exchanges (the
    // repartition IS the exchange); union-window re-shuffles the union
    val lPre = left.repartition(col("user_id"))
    val rPre = right.repartition(col("user_id"))
    time("union-window(pre)")(AsOfJoin.backward(lPre, rPre, keys,
      "ts_ms", "ts_ms", Seq("click_value"), "event_id"))
    time("native merge(pre)")(AsOfJoin.native(lPre, rPre, keys,
      "ts_ms", "ts_ms", Seq("click_value"), "event_id"))
    spark.stop()
  }
}
