package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DataSource V2 kline source: partition planning, pruning, pushdown. */
class KlineSourceSpec extends AnyFunSuite with SparkTestBase {

  private val t0 = 1704067200000L

  private def read(rows: Long = 2000, chunk: Int = 500) =
    spark.read.format("graft-klines")
      .option("coins", "BTC,ETH").option("interval", "1m")
      .option("startMs", t0).option("rows", rows).option("chunkRows", chunk)
      .load()

  test("row count and schema: coins × rows, deterministic across reads") {
    val df = read()
    assert(df.count() == 2 * 2000)
    assert(df.columns.toSeq == Seq("coin", "interval", "open_time",
      "open", "high", "low", "close", "volume"))
    val a = df.agg(sum(col("close"))).head().getDouble(0)
    val b = read().agg(sum(col("close"))).head().getDouble(0)
    assert(a == b, "generator must be deterministic")
    // invariants the generator promises
    val bad = df.filter(col("high") < col("low") ||
      col("high") < col("open") || col("low") > col("close")).count()
    assert(bad == 0)
  }

  test("one input partition per (coin, chunk) — the reference's fetch unit") {
    assert(read(rows = 2000, chunk = 500).rdd.getNumPartitions == 2 * 4)
    assert(read(rows = 2001, chunk = 500).rdd.getNumPartitions == 2 * 5)
  }

  test("open_time range filter prunes whole partitions at planning time") {
    // chunks: [t0, t0+500m) [t0+500m, t0+1000m) … keep only the 2nd
    val lo = t0 + 500L * 60000L
    val hi = t0 + 1000L * 60000L
    val filtered = read().filter(col("open_time") >= lo && col("open_time") < hi)
    assert(filtered.rdd.getNumPartitions == 2,
      s"expected 1 surviving chunk per coin, got ${filtered.rdd.getNumPartitions}")
    assert(filtered.count() == 2 * 500)
    // residual evaluation still exact at chunk edges
    val edge = read().filter(col("open_time") >= lo + 60000L && col("open_time") < hi)
    assert(edge.count() == 2 * 499)
  }

  test("column pruning reaches the row generator") {
    val pruned = read().select("coin", "close")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("pruned=[coin,close]"),
      s"scan description should show pruned columns:\n$plan")
    assert(pruned.distinct().count() > 0)
  }

  test("SQL catalog integration: CREATE TABLE ... USING `graft-klines`") {
    spark.sql("DROP TABLE IF EXISTS klines_sql")
    spark.sql(s"""CREATE TABLE klines_sql USING `graft-klines`
                 |OPTIONS (coins 'BTC,ETH', interval '1m',
                 |         startMs '$t0', rows '100', chunkRows '50')""".stripMargin)
    try {
      val n = spark.sql("SELECT count(*) FROM klines_sql").head().getLong(0)
      assert(n == 2 * 100)
      val perCoin = spark.sql(
        """SELECT coin, count(*) AS n FROM klines_sql
          |GROUP BY coin ORDER BY coin""".stripMargin).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(perCoin == Seq(("BTC", 100L), ("ETH", 100L)))
    } finally spark.sql("DROP TABLE IF EXISTS klines_sql")
  }

  test("source output flows into the enrichment pipeline shapes") {
    val daily = read()
      .groupBy(col("coin"), expr("open_time div 86400000").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"))
    assert(daily.count() == 2 * 2) // 2000 minutes spans 2 days per coin
  }

  private def readStreamDf(rows: Long, poll: Long) =
    spark.readStream.format("graft-klines")
      .option("coins", "BTC,ETH").option("interval", "1m")
      .option("startMs", t0).option("rows", rows).option("pollRows", poll)
      .load()

  test("micro-batch stream: pollRows admission per trigger, exactly-once total") {
    val dir = java.nio.file.Files.createTempDirectory("ksrc-cp").toString
    val q = readStreamDf(rows = 1200, poll = 500)
      .writeStream.format("memory").queryName("ksrc_stream")
      .option("checkpointLocation", dir).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ksrc_stream")
      assert(got.count() == 2 * 1200)
      assert(got.select("coin", "open_time").distinct().count() == 2 * 1200)
      // batches of <= pollRows per coin: at least ceil(1200/500) = 3 batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("composed: native source drives the reference's hourly-volume pipeline") {
    // the README's "coin volume over the last hour" workload with the
    // engine-native source standing in for Kafka+producer: stream →
    // event-time window → aggregate, all checkpointed
    val cp = java.nio.file.Files.createTempDirectory("ksrc-cp3").toString
    val agg = readStreamDf(rows = 180, poll = 90)
      .withColumn("ts", timestamp_millis(col("open_time")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("coin"))
      .agg(sum(col("volume")).as("volume"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ksrc_ohlc")
      .outputMode("complete")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ksrc_ohlc").collect()
        .map(r => (r.getAs[String]("coin"), r.getAs[Long]("n")))
      // 180 one-minute klines per coin = 3 full hours
      assert(rows.count(_._1 == "BTC") == 3 && rows.count(_._1 == "ETH") == 3)
      assert(rows.forall(_._2 == 60L))
    } finally q.stop()
  }

  test("micro-batch stream resumes from the committed offset after restart") {
    // file sink (memory sink cannot recover a checkpoint): stop after
    // the first frontier, restart with a further one — only the delta
    // may be appended
    val cp = java.nio.file.Files.createTempDirectory("ksrc-cp2").toString
    val out = java.nio.file.Files.createTempDirectory("ksrc-out").toString
    def start(rows: Long) = readStreamDf(rows, poll = 300)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    val q1 = start(600)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 2 * 600)
    val q2 = start(900)
    try { q2.processAllAvailable() } finally q2.stop()
    val all = spark.read.parquet(out)
    assert(all.count() == 2 * 900, "restart must emit only rows past the committed offset")
    assert(all.select("coin", "open_time").distinct().count() == 2 * 900)
  }
}