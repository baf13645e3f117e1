package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, Tables}
import graft.ops.Dedup

/** Scale probe for the banded sign-LSH embedding near-dup
  * (VERDICT r5 next #2): times [[Dedup.embeddingNearDupsAnnAdaptive]]
  * at a given fixture dir (best-of-3 after warm-up), prints the
  * adaptive (bands, bits) choice and the result count, and dumps the
  * MATCHING DuckDB oracle SQL (same hyperplane literals, same band
  * rule) to `<outDir>/ext_dedup_embedding_ann.sql` plus the Spark
  * result to `<outDir>/ext_dedup_embedding_ann/` so the standard
  * hash-compare can run cross-engine at sf1/sf5, where the adaptive
  * bits differ from the catalog's gate-scale pin.
  *
  * Usage: runMain graft.tools.AnnProbe <sfDir> [outDir]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val (bands, bits) = Dedup.annParams(n)
    println(s"n=$n bands=$bands bits=$bits buckets/band=${1 << bits}")

    def run() = Dedup.embeddingNearDupsAnnAdaptive(emb, threshold = 0.35)
    if (args.contains("debug")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
              f"runTime=${si.taskMetrics.executorRunTime / 1000.0}%.1f s " +
              f"cpuTime=${si.taskMetrics.executorCpuTime / 1e9}%.1f s " +
              si.name.take(60))
          }
        })
      def t(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[debug] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      t("full (with distinct)") {
        Dedup.embeddingNearDupsAnn(emb, 0.35, bands, bits).count()
      }
      t("no distinct") {
        Dedup.embeddingNearDupsAnn(emb, 0.35, bands, bits, dedup = false)
          .groupBy().count().head().getLong(0)
      }
      t("enumeration only (threshold -2, no distinct)") {
        Dedup.embeddingNearDupsAnn(emb, -2.0, bands, bits, dedup = false)
          .groupBy().count().head().getLong(0)
      }
      run().explain()
    }
    run().write.mode("overwrite").format("noop").save() // warm-up
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      run().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"pairs=${run().count()} times=${times.map(t => f"$t%.2f").mkString(",")} best=${times.min}%.2f s")

    outDir.foreach { dir =>
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(s"$dir/ext_dedup_embedding_ann.sql"),
        SparkEntry.embAnnOracleSql(bands, bits))
      run().coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/ext_dedup_embedding_ann")
      println(s"oracle SQL + result dumped to $dir")
    }
    spark.stop()
  }
}
