package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Skew

/** Measures the skew toolkit on a synthetic hot key: 8M fact rows,
  * 85% on ONE key, shuffle-joined against a 100k-key dim. Three
  * plans: AQE skew-split (the first line of defense), salted join
  * (`ops.Skew`, when AQE's split isn't available — e.g. the skewed
  * side feeds an aggregation), and AQE disabled (what a static plan
  * does). Usage: runMain graft.tools.SkewProbe
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // defeat broadcast so the dim join actually shuffles (the skewed
    // shuffle is the thing under test)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val fact = spark.range(8000000L).select(
      when(col("id") % 100 < 85, 0L)
        .otherwise(pmod(hash(col("id")), lit(100000))).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val dim = spark.range(100000L).select(col("id").as("k"),
      (col("id") * 2).as("dval"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    def plain = fact.join(dim, Seq("k")).select(col("k"), col("v") + col("dval"))

    time("AQE skew-split join   ")(plain)
    time("salted join (16 salts)")(
      Skew.saltedJoin(fact, dim, Seq("k")).select(col("k"), col("v") + col("dval")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("AQE OFF plain join    ")(plain)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
