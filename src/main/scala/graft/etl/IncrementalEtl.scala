package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's polling incremental ETL
  * (/root/reference/spark/streaming-longtime-raw.py:52-199) rebuilt on
  * Structured Streaming's checkpointed state.
  *
  * The reference hand-rolls a high-watermark: an in-memory dict saved
  * to `timestamps.json` by an `atexit` hook, updated BEFORE the write
  * commits — crash ⇒ duplicates, kill -9 ⇒ lost watermark (SURVEY.md
  * §2.8 `strm_poll_watermark`). Here the file-source offset log +
  * sink commit log live in one checkpoint directory and commit AFTER
  * the batch lands, giving exactly-once file output with zero custom
  * state code.
  *
  * Scale: the source lists only files newer than the checkpoint
  * offset (no full rescan); output is written partitioned so
  * downstream reads prune. `Trigger.AvailableNow` drains everything
  * then stops — the 60 s polling loop becomes either a scheduler
  * rerun or `Trigger.ProcessingTime(60s)` for a resident stream.
  */
object IncrementalEtl {

  /** One incremental pass: new files under `srcDir` → partitioned
    * parquet under `destDir`. Returns after the drain completes.
    */
  def runAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      destDir: String,
      checkpointDir: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val q = start(spark, srcDir, schema, destDir, checkpointDir, partitionCols,
      Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** Resident form: same pipeline on a processing-time trigger
    * (the reference's `time.sleep(60)` loop, minus the sleep). */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      destDir: String,
      checkpointDir: String,
      partitionCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val writer = src.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .start()
  }
}
