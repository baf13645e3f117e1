package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Kline

/** The reference's ingest pipeline (Kafka JSON bytes → typed, enriched
  * rows) re-expressed as composable DataFrame transforms that work
  * identically on batch and streaming frames (Structured Streaming's
  * unified model): `parse` and `enrich` are plan fragments, the caller
  * decides whether the input came from `read` or `readStream`.
  *
  * Reference behavior being reproduced:
  *  - CAST(value AS STRING) + from_json(schema) + select("data.*")
  *    (/root/reference/spark/streaming-longtime.py:55-57) — PERMISSIVE
  *    parse, malformed fields → null;
  *  - epoch-ms → timestamp via (col/1000).cast(timestamp)
  *    (streaming-longtime.py:60-61);
  *  - derived year/month columns (streaming-longtime.py:62-63).
  */
object KlineIngest {

  /** Kafka-framed binary records → typed kline rows (null-on-malformed). */
  def parse(raw: DataFrame): DataFrame =
    raw
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), Kline.schema).alias("data"))
      .select("data.*")

  /** Epoch-ms longs → timestamps + derived year/month.
    *
    * `timestamp_millis` is exact integer semantics; the reference's
    * `(col/1000).cast("timestamp")` goes through Double division which
    * loses precision above 2^53 µs — for real kline data (ms since 1970)
    * the two agree to the millisecond.
    */
  def enrich(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("timestamp", timestamp_millis(col("timestamp")))
      .withColumn("close_time", timestamp_millis(col("close_time")))
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))

  /** Streaming source matching the reference's Kafka options
    * (streaming-longtime.py:47-54): latest offsets, don't fail on
    * data loss (retention-expired offsets). Requires the spark-sql-kafka
    * connector on the classpath at runtime; plan construction itself is
    * connector-agnostic, which is why tests drive [[parse]]/[[enrich]]
    * from memory/file streams instead.
    */
  def fromKafka(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .load()

  /** Kafka-producer frame (reference §2.2 `sink_kafka_produce`): rows
    * → (key, value) binary columns, value = JSON of all fields — the
    * inverse of [[parse]]. Feed to `.write.format("kafka")` where the
    * connector is present.
    */
  def toKafkaFrame(df: DataFrame): DataFrame =
    df.select(
      col("coin").cast("binary").as("key"),
      to_json(struct(df.columns.map(col): _*)).cast("binary").as("value"))

  /** The reference's per-batch schema guard
    * (streaming-longtime.py:115-117): driver-side metadata check, no
    * job triggered.
    */
  def hasRequiredColumns(df: DataFrame, required: Seq[String] = Seq("coin", "interval")): Boolean =
    required.forall(df.columns.contains)

  /** Exactly-once-friendly dedup the reference lacks (SURVEY.md §2.8
    * strm_late_data): Binance re-fetches overlapping windows each poll
    * cycle so duplicates are inherent. Keyed dedup + event-time
    * watermark bounds the state store; on a cluster the state is
    * hash-partitioned by the dedup key.
    */
  def dedupStream(enriched: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    enriched
      .withWatermark("timestamp", watermarkDelay)
      .dropDuplicates(Seq("coin", "interval", "timestamp"))
}
