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

  test("health view: flagship lag + index segment posture in one operator table") {
    // the single table an operator reads (r9 VERDICT #6): the kline
    // JDBC flagship and the index-maintenance stream run under ONE
    // telemetry recorder, and Telemetry.healthView joins each query's
    // lag summary with describeIndex's segment posture for the
    // queries that maintain an index — after a lagging, segment-heavy
    // run, both failure signals surface in the same rows
    implicit val ctx = spark.sqlContext
    import graft.etl.IndexIngest
    val t0 = 1704067200000L
    val tmp = Files.createTempDirectory("kp-health").toString
    val (telem, corpus, idx) = (s"$tmp/telem", s"$tmp/corpus", s"$tmp/idx")
    val rec = graft.streaming.Telemetry.attach(spark, telem)
    def vec(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(32)(rnd.nextGaussian().toFloat)
    }
    IndexIngest.bootstrapDedupedIvfPq(
      (0 until 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      corpus, idx, nlist = 4, m = 4, ksub = 16)
    // flagship, named so the health view's rows are addressable
    val ms = MemoryStream[String]
    val q = KlinePipeline.longtimeJdbc(
      ms.toDF().select(col("value").cast("binary").as("value")),
      url, "klines_health", props,
      Files.createTempDirectory("kp-health-cp").toString)
      .queryName("kline_flagship").start()
    // index maintenance: three AvailableNow rounds on one checkpoint
    // = three committed segments beside base (threshold 64: no fold —
    // the segment-heavy posture the view exists to surface)
    val es = MemoryStream[(Long, Array[Float])]
    val icp = s"$tmp/icp"
    (0 until 3).foreach { r =>
      es.addData((20 + 10 * r until 30 + 10 * r).map(i => (i.toLong, vec(i))): _*)
      val iq = IndexIngest.startDedupedIvfPqAppend(
        es.toDF().toDF("vec_id", "embedding"), corpus, idx, icp,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        queryName = Some("idx_maint"))
      iq.awaitTermination()
    }
    try {
      ms.addData(klineJson("BTC", t0, 1.5))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (rec.pending() < 4 && System.nanoTime() < deadline)
        Thread.sleep(20)
      rec.flush()
      val hv = graft.streaming.Telemetry.healthView(spark, telem,
        triggerMs = 0L, indexes = Map("idx_maint" -> idx))
        .collect().map(r => r.getAs[String]("query_name") -> r).toMap
      val flag = hv("kline_flagship")
      assert(flag.getAs[Long]("batches") >= 1L &&
        flag.getAs[Long]("lagging_batches") >= 1L)
      assert(flag.isNullAt(flag.fieldIndex("index_segments")),
        "flagship maintains no index — its index columns must be null")
      val maint = hv("idx_maint")
      assert(maint.getAs[Long]("lagging_batches") >= 1L)
      assert(maint.getAs[Long]("index_segments") === 4L, // base + 3
        s"segment posture wrong: ${maint}")
      assert(maint.getAs[Long]("index_rows") === 50L)
      assert(maint.getAs[Boolean]("index_epoch_coherent"))
    } finally {
      q.stop(); rec.stop()
    }
  }
}
