package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{GraftSession, Tables}

/** Ad-hoc timing harness for aggregation strategies on the q1 shape:
  * is the DECIMAL(38,6) accumulation (chosen for order-independent
  * oracle exactness) the bottleneck vs a plain double sum vs a
  * scaled-long sum? Usage: runMain graft.tools.PerfProbe <sfDir>
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Dec = DecimalType(38, 6)
    def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")
    def lsum(c: Column): Column = // exact decimal-micro accumulation in long
      (sum((c * 1000000.0).cast("long")) / 1000000.0)

    def q1(agg: Column => Column) = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit(java.time.LocalDateTime.of(1998, 9, 2, 0, 0)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        agg(col("l_quantity")).as("sum_qty"),
        agg(col("l_extendedprice")).as("sum_base"),
        agg(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    time("q1 decimal")(q1(dsum))
    time("q1 double ")(q1(c => sum(c)))
    time("q1 long   ")(q1(lsum))
    time("scan only ")(Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    spark.stop()
  }
}
