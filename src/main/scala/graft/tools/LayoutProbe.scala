package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Layout

/** Measures what the z-order layout buys at scan time: the same
  * selective range predicate on each clustered dimension against
  * (a) the natural layout, (b) a partkey-sorted layout, (c) the
  * z-ordered layout. Parquet row-group stats make the predicate a
  * skip decision per row group, so tight per-file spans turn into
  * skipped I/O. Usage: runMain graft.tools.LayoutProbe [sfDir]
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
    val base = s"${System.getProperty("java.io.tmpdir")}/layout-probe"
    val natural = s"$base/natural"
    val sorted = s"$base/sorted"
    val zorder = s"$base/zorder"
    li.repartition(16).write.mode("overwrite").parquet(natural)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sorted)
    // 16 files ≈ 16 z-ranges; one row group each at this scale
    Layout.zorderWrite(li, col("l_partkey"), col("l_suppkey"), zorder, files = 16)

    for ((name, path) <- Seq("natural" -> natural, "sorted(part)" -> sorted,
        "zorder" -> zorder)) {
      val df = spark.read.parquet(path)
      println(f"$name%-13s spans: part ${Layout.meanFileSpan(df, "l_partkey")}%8.0f" +
        f"  supp ${Layout.meanFileSpan(df, "l_suppkey")}%6.0f")
    }

    def time(name: String)(thunk: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        thunk
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    for ((name, path) <- Seq("natural" -> natural, "sorted(part)" -> sorted,
        "zorder" -> zorder)) {
      val df = spark.read.parquet(path)
      time(s"$name  partkey range") {
        df.filter(col("l_partkey").between(100, 600))
          .agg(sum(col("l_quantity"))).collect()
      }
      time(s"$name  suppkey range") {
        df.filter(col("l_suppkey").between(10, 60))
          .agg(sum(col("l_quantity"))).collect()
      }
    }
    spark.stop()
  }
}
