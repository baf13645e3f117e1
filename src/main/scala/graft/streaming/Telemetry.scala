package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-trigger telemetry for long-running streams, persisted as an
  * ordinary parquet table — the operational record a 100 TB ingest
  * needs: at a 60 s trigger a single pipeline commits ~1,440 batches
  * a day, and "is it keeping up / where did the regression start /
  * which batch blew the watermark" are questions about HISTORY that
  * the transient `lastProgress` cannot answer and driver logs answer
  * only until they rotate.
  *
  * Design:
  *   - A [[StreamingQueryListener]] captures every
  *     `QueryProgressEvent` into a driver-side queue (progress events
  *     are tiny — name/id/rows/durations — so retention is bounded by
  *     flush cadence, not data volume).
  *   - [[Telemetry.flush]] drains the queue and APPENDS one parquet
  *     row per batch, partitioned by query name: reads prune to the
  *     pipeline under investigation, and the write path never touches
  *     another query's history. Flush is explicit (call it from a
  *     monitoring tick or after `processAllAvailable` in tests) so
  *     the listener thread itself never blocks on a commit — a slow
  *     metrics disk must not back-pressure the listener bus.
  *   - Progress events are emitted AFTER a batch commits and are not
  *     replayed on restart, so plain append mode cannot double-count
  *     a batch; a crash between commit and flush loses at most the
  *     queued telemetry rows (metrics, not data — the deliberate
  *     trade, same as every metrics system).
  *
  * The table is queryable with the engine itself, e.g. rows-per-second
  * percentiles per query, or batches whose `batch_duration_ms`
  * exceeded the trigger interval (the falling-behind signal).
  */
object Telemetry {

  final class Recorder private[Telemetry] (
      spark: SparkSession, outDir: String) {
    private[Telemetry] val queue =
      new ConcurrentLinkedQueue[QueryProgressEvent]()

    private[Telemetry] val listener: StreamingQueryListener =
      new StreamingQueryListener {
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          queue.add(e)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }

    /** Drain captured progress events into the parquet table; returns
      * the number of batch rows written. Cheap when nothing queued.
      */
    def flush(): Long = {
      import spark.implicits._
      var rows = List.empty[(String, String, String, Long, String,
        Long, Double, Double, Long, Long, Long, String)]
      var ev = queue.poll()
      while (ev != null) {
        val p = ev.progress
        val stateRows = Option(p.stateOperators)
          .map(_.map(_.numRowsTotal).sum).getOrElse(0L)
        val watermark = Option(p.eventTime)
          .flatMap(m => Option(m.get("watermark"))).getOrElse("")
        rows = (Option(p.name).getOrElse(""), p.id.toString,
          p.runId.toString, p.batchId, p.timestamp, p.numInputRows,
          p.inputRowsPerSecond, p.processedRowsPerSecond,
          Option(p.durationMs)
            .flatMap(m => Option(m.get("triggerExecution")))
            .map(_.longValue()).getOrElse(0L),
          Option(p.durationMs)
            .flatMap(m => Option(m.get("addBatch")))
            .map(_.longValue()).getOrElse(0L),
          stateRows, watermark) :: rows
        ev = queue.poll()
      }
      if (rows.isEmpty) 0L
      else {
        rows.toDF("query_name", "query_id", "run_id", "batch_id",
            "batch_ts", "input_rows", "input_rows_per_sec",
            "processed_rows_per_sec", "batch_duration_ms",
            "add_batch_ms", "state_rows", "watermark")
          // NaN rates (first batch has no elapsed denominator) store
          // as NULL so SQL aggregates skip them instead of poisoning
          .withColumn("input_rows_per_sec",
            when(isnan(col("input_rows_per_sec")), lit(null))
              .otherwise(col("input_rows_per_sec")))
          .withColumn("processed_rows_per_sec",
            when(isnan(col("processed_rows_per_sec")), lit(null))
              .otherwise(col("processed_rows_per_sec")))
          .coalesce(1)
          .write.mode("append").partitionBy("query_name").parquet(outDir)
        rows.size.toLong
      }
    }

    /** Progress events captured but not yet flushed. The listener bus
      * delivers asynchronously — a caller that must see a specific
      * batch (tests, a drain-before-shutdown hook) waits on this
      * rather than assuming `processAllAvailable` implies delivery.
      */
    def pending(): Int = queue.size()

    /** Detach from the listener bus (queued events remain flushable). */
    def stop(): Unit = spark.streams.removeListener(listener)
  }

  /** Attach a recorder to the session's listener bus. One recorder
    * observes EVERY streaming query on the session; the partition
    * column keeps their histories separate.
    */
  def attach(spark: SparkSession, outDir: String): Recorder = {
    val r = new Recorder(spark, outDir)
    spark.streams.addListener(r.listener)
    r
  }

  /** The falling-behind report: batches whose trigger execution took
    * longer than the trigger interval — each one a trigger that
    * started late, the first observable of an unsustainable pipeline.
    */
  def laggingBatches(spark: SparkSession, outDir: String,
                     triggerMs: Long): org.apache.spark.sql.DataFrame =
    spark.read.parquet(outDir)
      .filter(col("batch_duration_ms") > triggerMs)
      .select(col("query_name"), col("batch_id"), col("batch_ts"),
        col("input_rows"), col("batch_duration_ms"), col("state_rows"))
      .orderBy(col("query_name"), col("batch_id"))
}
