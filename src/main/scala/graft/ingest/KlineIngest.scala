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
      .options(kafkaSourceOptions(bootstrapServers, topic))
      .load()

  /** The exact option map [[fromKafka]] hands the connector — exposed
    * so `IngestSpec` golden-asserts the keys/values (the connector jar
    * is absent in this container, so `.load()` itself can't run; a
    * typo in an option NAME would otherwise be silently ignored by
    * Kafka's permissive option parsing and ship). */
  private[graft] def kafkaSourceOptions(
      bootstrapServers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> "latest",
    "failOnDataLoss" -> "false")

  /** In-engine replacement for the reference's REST pollers
    * (§2.1 `src_rest_poll`): the built-in rate source dressed as the
    * kline feed — same schema and Kafka value framing the producers
    * emit, so the whole pipeline can be driven without any external
    * system (demos, soak tests, backpressure experiments).
    */
  def simulatedStream(spark: SparkSession, rowsPerSecond: Int = 1000): DataFrame = {
    val coins = array(lit("BTCUSDC"), lit("ETHUSDC"), lit("XRPUSDC"), lit("SOLUSDC"))
    val intervals = array(lit("1m"), lit("5m"), lit("15m"), lit("1h"), lit("1d"))
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(to_json(struct(
        element_at(coins, (col("value") % 4 + 1).cast("int")).as("coin"),
        // open time MINUTE-aligned like a real candle: the feed then
        // re-sends each (coin, interval, minute) key many times per
        // cycle — the duplicate-heavy shape the reference's
        // overlapping REST fetches produce and its keyed dedup exists
        // for (raw rate-source ms stamps would make every row a
        // unique key, a feed no kline API emits)
        (expr("unix_millis(timestamp) div 60000") * 60000L).as("timestamp"),
        (rand() * 100).as("open"), (rand() * 100).as("high"),
        (rand() * 100).as("low"), (rand() * 100).as("close"),
        (rand() * 10).as("volume"),
        (expr("unix_millis(timestamp) div 60000") * 60000L + 59999L)
          .as("close_time"),
        (rand() * 1000).as("quote_asset_volume"),
        (col("value") % 100).cast("int").as("number_of_trades"),
        (rand() * 5).as("taker_buy_base_asset_volume"),
        (rand() * 500).as("taker_buy_quote_asset_volume"),
        lit("0").as("ignore"),
        element_at(intervals, (col("value") % 5 + 1).cast("int")).as("interval")
      )).cast("binary").as("value"))
  }

  /** Kafka-producer frame (reference §2.2 `sink_kafka_produce`): rows
    * → (key, value) binary columns, value = JSON of all fields — the
    * inverse of [[parse]]. Feed to `.write.format("kafka")` where the
    * connector is present.
    */
  def toKafkaFrame(df: DataFrame): DataFrame =
    df.select(
      col("coin").cast("binary").as("key"),
      to_json(struct(df.columns.toSeq.map(col): _*)).cast("binary").as("value"))

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
