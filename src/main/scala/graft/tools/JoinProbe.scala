package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Stage-level evidence for the near-linear shuffle-bound joins
  * (VERDICT r7 next #9): runs the named catalog queries end-to-end
  * (noop sink, full plan) with a stage listener and prints, per stage,
  * task count, shuffle read/write bytes, spill, and wall time — the
  * numbers that decide whether `join_shuffle_agg` (exp 0.84) and
  * `sql_q5_local_supplier` (exp 0.90) are AQE-sized correctly at 150M
  * rows or hiding a skew/spill problem.
  *
  * Usage: runMain graft.tools.JoinProbe <sfDir> [query1,query2,...]
  */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("join_shuffle_agg,sql_q5_local_supplier")
      .split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuneFor(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus),
      sfDir, cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, tasks: Int, ms: Long,
                  shRead: Long, shWrite: Long, spill: Long, inBytes: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
            i.numTasks,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
            m.diskBytesSpilled, m.inputMetrics.bytesRead)
        }
      }
    })

    def gb(b: Long) = f"${b / 1e9}%.2f GB"
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once (page cache / codegen), measure second; let the warm
      // run's async stage events drain BEFORE clearing, or stragglers
      // would pollute the measured table
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      Thread.sleep(3000)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously after the job returns
      // (the bus has no public flush — a short settle is a probe's due)
      Thread.sleep(3000)
      val snap = stages.synchronized(stages.toList)
      println(f"== $name: $sec%.1f s, ${snap.size} stages")
      snap.sortBy(-_.ms).foreach { s =>
        println(f"  stage ${s.id}%3d ${s.ms / 1000.0}%6.1f s tasks=${s.tasks}%3d " +
          f"input=${gb(s.inBytes)} shRead=${gb(s.shRead)} " +
          f"shWrite=${gb(s.shWrite)} spill=${gb(s.spill)} ${s.name}")
      }
    }
    spark.stop()
  }
}
