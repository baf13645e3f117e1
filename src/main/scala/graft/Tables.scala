package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, TESTDATA.md). All scans are plain parquet
  * reads so Catalyst's filter pushdown / column pruning reach the
  * scan node — callers filter/select on the returned frame and the
  * predicate lands in `PushedFilters`.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture as a temp view so users can work through
    * `spark.sql(...)` — the reference's users write SQL-ish PySpark;
    * this is the drop-in SQL surface (plus graft_* functions from
    * GraftExtensions).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** Raw events: `ts` is epoch-nanos LongType (see GraftSession's
    * `nanosAsLong`). This is the kline-stream stand-in (FIXTURES.md §1).
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  /** Events with event-time materialized: epoch-ms long (`ts_ms`, exact
    * integer arithmetic — safe for oracle comparison) and a proper
    * timestamp column (`event_ts`) for window functions. Equivalent of
    * the reference's epoch→timestamp enrichment
    * (/root/reference/spark/streaming-longtime.py:60-63).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
}
