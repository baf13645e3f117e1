package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `explain formatted` for every catalog query — the plan-review
  * loop the brief mandates (pushdown reached the scan? dims broadcast?
  * whole-stage codegen spans wide?). Usage:
  *   runMain graft.Explain <sfDir> <outDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.catalog.foreach { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q.name}.txt"), plan)
      } catch { case e: Throwable =>
        Files.writeString(Paths.get(s"$outDir/${q.name}.txt"), s"FAILED: $e")
      }
    }
    spark.stop()
  }
}
