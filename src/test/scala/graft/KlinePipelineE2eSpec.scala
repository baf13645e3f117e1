package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipelines.KlinePipeline

/** The reference-parity flagship, end to end through one composition
  * (`KlinePipeline.longtimeJdbc`): Kafka-shaped source → PERMISSIVE
  * parse → enrich → keyed watermarked dedup → exactly-once MERGE
  * sink — `streaming-longtime.py`'s job with the upgrades the engine
  * exists for (checkpointing, dedup, idempotent sink), crash-injected
  * at every stage boundary:
  *
  *  1. crash BEFORE processing (data arrived, nothing ran) — restart
  *     from the checkpoint picks the batch up;
  *  2. crash AFTER the sink effect, BEFORE the epoch commit (the
  *     hardest window) — injected through the pipeline's chaos seam,
  *     the replayed batch re-MERGEs the same keys to the same values;
  *  3. a "crashed attempt" replay — the exact foreachBatch body runs
  *     once OUTSIDE the stream (its write lands, the checkpoint never
  *     hears of it), then the stream replays the same rows.
  *
  * Recovery is byte-identical: the crashed run's final table equals
  * an uninterrupted twin run over the same input.
  */
class KlinePipelineE2eSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftE2e;create=true"
  private val props = new java.util.Properties()

  private def klineJson(coin: String, ts: Long, close: Double): String =
    s"""{"coin":"$coin","timestamp":$ts,"open":1.0,"high":2.0,"low":0.5,
       |"close":$close,"volume":10.0,"close_time":${ts + 59999},
       |"quote_asset_volume":15.0,"number_of_trades":7,
       |"taker_buy_base_asset_volume":4.0,"taker_buy_quote_asset_volume":6.0,
       |"ignore":"0","interval":"1m"}""".stripMargin.replaceAll("\n", "")

  private def readBack(table: String): Set[String] =
    spark.read.jdbc(url, table, props)
      .collect()
      // full-row compare, null-tolerant (the malformed kline is an
      // all-null row by the PERMISSIVE-parse contract)
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("flagship e2e: crash at every stage boundary, byte-identical recovery") {
    implicit val ctx = spark.sqlContext
    val t0 = 1704067200000L
    val b0 = Seq(klineJson("BTC", t0, 1.5), klineJson("BTC", t0, 1.5), // in-batch dup
      klineJson("ETH", t0, 2.5), """not json at all""") // malformed → null row
    val b1 = Seq(klineJson("BTC", t0, 1.5), // cross-batch re-delivery
      klineJson("BTC", t0 + 60000, 1.7), klineJson("SOL", t0, 3.5))
    val b2 = Seq(klineJson("ETH", t0 + 60000, 2.7), klineJson("ETH", t0, 2.5))

    // --- crashed run ------------------------------------------------
    val cp = Files.createTempDirectory("kp-e2e-cp").toString
    val ms = MemoryStream[String]
    def shaped = ms.toDF().select(col("value").cast("binary").as("value"))
    def run(chaos: Long => Unit = _ => ()): Unit = {
      val q = KlinePipeline.longtimeJdbc(shaped, url, "klines_e2e", props,
        cp, chaosAfterSink = chaos).start()
      try q.processAllAvailable() finally q.stop()
    }
    // boundary 1: data arrives, then "crash" before anything processes
    ms.addData(b0: _*)
    run() // processes b0 normally
    // boundary 2: crash AFTER the sink effect, BEFORE the epoch commit
    ms.addData(b1: _*)
    val boom = intercept[Exception] {
      val q = KlinePipeline.longtimeJdbc(shaped, url, "klines_e2e", props,
        cp, chaosAfterSink =
          _ => throw new RuntimeException("chaos: post-sink crash")).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(boom.getMessage != null)
    // the sink effect LANDED even though the epoch never committed
    assert(readBack("klines_e2e").exists(_.startsWith("SOL")),
      "fixture drifted: the chaos window should land after the MERGE")
    run() // restart: the batch replays, the MERGE absorbs it
    // boundary 3: a crashed ATTEMPT of b2 outside the stream (write
    // lands, checkpoint never hears of it), then the stream replays
    KlinePipeline.upsertBatch(
      KlinePipeline.enriched(b2.toDF("value")
        .select(col("value").cast("binary").as("value")), dedup = false),
      url, "klines_e2e", props)
    ms.addData(b2: _*)
    run()

    // --- uninterrupted twin ----------------------------------------
    val cpRef = Files.createTempDirectory("kp-e2e-cp-ref").toString
    val msRef = MemoryStream[String]
    msRef.addData((b0 ++ b1 ++ b2): _*)
    val qRef = KlinePipeline.longtimeJdbc(
      msRef.toDF().select(col("value").cast("binary").as("value")),
      url, "klines_ref", props, cpRef).start()
    try qRef.processAllAvailable() finally qRef.stop()

    val got = readBack("klines_e2e")
    val want = readBack("klines_ref")
    assert(got === want, s"crashed run diverged: got $got want $want")
    // and the dedup stage really deduplicated: one row per kline bar
    // (5 distinct (coin, interval, ts) keys + the malformed null row)
    assert(got.size === want.size)
    val n = spark.read.jdbc(url, "klines_e2e", props).count()
    assert(n === 6L, s"expected 6 rows (5 bars + null-key), got $n")
  }

  test("flagship + telemetry: the ops record captures every committed trigger") {
    // the composition a deployment actually runs: the flagship
    // pipeline with streaming.Telemetry attached, so the ~1,440
    // triggers/day leave a queryable history instead of rotated logs
    implicit val ctx = spark.sqlContext
    val t0 = 1704067200000L
    val out = Files.createTempDirectory("kp-telemetry").toString
    val rec = graft.streaming.Telemetry.attach(spark, out)
    val ms = MemoryStream[String]
    val q = KlinePipeline.longtimeJdbc(
      ms.toDF().select(col("value").cast("binary").as("value")),
      url, "klines_tel", props,
      Files.createTempDirectory("kp-tel-cp").toString).start()
    try {
      ms.addData(klineJson("BTC", t0, 1.5), klineJson("ETH", t0, 2.5))
      q.processAllAvailable()
      ms.addData(klineJson("SOL", t0, 3.5))
      q.processAllAvailable()
      // the bus delivers asynchronously; wait for both data batches
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (rec.pending() < 2 && System.nanoTime() < deadline)
        Thread.sleep(20)
      rec.flush()
      val hist = spark.read.parquet(out)
        .filter(col("query_id") === q.id.toString)
        .filter(col("input_rows") > 0)
      // batch ids need not be contiguous (the watermarked dedup stage
      // commits no-data batches to advance state) — assert the DATA
      // batches' counts in commit order
      val byBatch = hist.select("batch_id", "input_rows")
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      assert(byBatch === Seq(2L, 1L),
        s"flagship history wrong: $byBatch")
      // the falling-behind report runs over the pipeline's history
      assert(graft.streaming.Telemetry.laggingBatches(spark, out, 0L)
        .filter(col("query_id") === q.id.toString).count() >= 1L)
    } finally {
      q.stop(); rec.stop()
    }
  }
}
