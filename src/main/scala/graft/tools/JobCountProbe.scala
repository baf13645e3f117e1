package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Per-entry Spark JOB counts for the steady-state (warm) run of each
  * named catalog/bench entry — r14 optimization evidence: at bench
  * scale the expensive entries are scheduling-latency-bound (~60-90 ms
  * per tiny job), so the job count is the denominator the wall divides
  * into. Runs each entry twice (first run builds fixture indexes and
  * JIT), reports the second run's jobs/stages/wall.
  *
  * Usage: runMain graft.tools.JobCountProbe <sfDir> [names...]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("ext_sim_ivfpq_adaptive", "ext_sim_filtered_ivfpq",
        "ext_sim_ivfpq_delta", "ext_sim_lsh_delta", "ext_sim_ivfpq_appended",
        "ext_sim_ivf_indexed", "ext_sim_ivfpq_deleted", "ext_lm_quality_tiers",
        "ext_dedup_semantic", "ext_sim_ivfpq_indexed", "ext_sim_lsh_indexed",
        "ext_sim_binary_indexed", "ext_sim_filtered", "ext_sim_retained",
        "ext_sim_filtered_lsh", "ext_dedup_embedding_ann", "ext_decontaminate_bloom",
        "ext_pipeline_e2e", "ext_dedup_substring_apply", "ext_multimodal_features",
        "ext_dedup_minhash", "ext_tfidf", "win_rank_suite", "sql_recursive_cte",
        "join_semi_exists", "agg_having")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuneFor(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      sfDir, cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    names.flatMap(n => all.get(n).map(n -> _)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[jc] $name%-34s wall=$w%6.3f jobs=${jobs.get}%3d stages=${stages.get}%3d")
      } catch { case e: Throwable =>
        println(s"[jc] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
