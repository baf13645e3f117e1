package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Controlled A/B of the index partition layouts (flat cell /
  * cell-outer seg / seg-outer cell): writes the SAME assigned corpus
  * three ways, interleaved 3×, on one box state — isolates directory
  * layout cost from co-tenant noise. Usage:
  * runMain graft.tools.LayoutAbProbe <sfDir> [nlist]
  */
object LayoutAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfdata/sf5")
    val nlist = args.lift(1).map(_.toInt).getOrElse(400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    // materialize a stable assigned frame once (cell = hash bucket —
    // layout cost doesn't care that it's not kmeans)
    val assigned = emb.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb"),
        pmod(xxhash64(col("vec_id")), lit(nlist)).cast("int").as("cell"))
      .localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("layout-ab").toString

    def t(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (i <- 1 to 3) {
      acc("flat") = t("flat") {
        assigned.repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/flat")
      } :: acc.getOrElse("flat", Nil)
      acc("cell,seg") = t("cs") {
        assigned.withColumn("seg", lit("base")).repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell", "seg").parquet(s"$tmp/cs")
      } :: acc.getOrElse("cell,seg", Nil)
      acc("seg,cell") = t("sc") {
        assigned.withColumn("seg", lit("base")).repartition(col("cell"))
          .write.mode("overwrite").partitionBy("seg", "cell").parquet(s"$tmp/sc")
      } :: acc.getOrElse("seg,cell", Nil)
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[layout] $k%-9s ${ts.reverse.map(x => f"$x%.2f").mkString(",")} best=${ts.min}%.2f s")
    }
    // probe-side read cost: list + prune + read one cell
    Seq("flat" -> s"$tmp/flat", "cell,seg" -> s"$tmp/cs", "seg,cell" -> s"$tmp/sc")
      .foreach { case (k, d) =>
        val ts = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          t("read") {
            spark.read.parquet(d).filter(col("cell").isin(1, 2, 3))
              .agg(count(lit(1))).collect()
          }
        }
        println(f"[probe]  $k%-9s ${ts.map(x => f"$x%.2f").mkString(",")} best=${ts.min}%.2f s")
      }
    spark.stop()
  }
}
