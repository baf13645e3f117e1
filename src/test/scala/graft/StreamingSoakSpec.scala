package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.Routing

/** Streaming soak (VERDICT r5 next #8): ≥100 micro-batches over the
  * DSv2 kline source → enrichment → routed partitioned sink, with a
  * CRASH injected mid-run and a restart from the same checkpoint.
  * The contract is exactly-once end-to-end row counts: the crash
  * fails a micro-batch's write job atomically (the file committer
  * discards the failed job's temporary output, no marker is written,
  * the engine never records the epoch), so the restart replays that
  * batch once and drains the remainder — no duplicates, no losses,
  * across 100+ committed epochs.
  */
class StreamingSoakSpec extends AnyFunSuite with SparkTestBase {

  test("soak: 100+ micro-batches with mid-run crash/restart are exactly-once") {
    val out = Files.createTempDirectory("soak-out").toString
    val cp = Files.createTempDirectory("soak-cp").toString
    val t0 = 1704067200000L
    val perCoin = 15000L // × pollRows 150 → 100 micro-batches
    val poll = 150L
    val nCoins = 4
    val stepMs = 60000L

    // crash injection: rows past `boomAt` poison the batch that first
    // contains them — the write job fails before anything commits.
    // Leg 2 sets the threshold past the end so the same column (and
    // schema) rides along without firing.
    def stream(boomAt: Long) =
      spark.readStream.format("graft-klines")
        .option("coins", "BTC,ETH,BNB,SOL").option("interval", "1m")
        .option("startMs", t0).option("rows", perCoin).option("pollRows", poll)
        .load()
        .withColumn("ts", timestamp_millis(col("open_time")))
        .withColumn("spread", col("high") - col("low"))
        .withColumn("guard",
          when(col("open_time") >= lit(boomAt),
            raise_error(lit("soak: injected crash"))).otherwise(lit(0)))

    // leg 1: dies at micro-batch 40 (rows 6000.. poison it)
    val boomTime = t0 + 40 * poll * stepMs
    val q1 = Routing.routedParquet(stream(boomTime), out, cp).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the local checksummed FS writes a .crc twin per marker — count
    // only the real batch_N files
    def markerCount = Option(new java.io.File(s"$cp/graft-sink-commits")
      .list()).fold(0)(_.count(_.startsWith("batch_")))
    val committedAfterCrash = markerCount
    assert(committedAfterCrash >= 39 && committedAfterCrash <= 41,
      s"crash should land ~batch 40, committed=$committedAfterCrash")
    val midRows = spark.read.parquet(out).count()
    assert(midRows == committedAfterCrash * poll * nCoins,
      "committed batches must be exactly on disk, failed batch absent")

    // leg 2: same checkpoint, poison disabled → replay batch 40 once,
    // drain through batch 99
    val q2 = Routing.routedParquet(
      stream(boomAt = Long.MaxValue), out, cp).start()
    q2.awaitTermination()

    val back = spark.read.parquet(out)
    val total = perCoin * nCoins
    assert(back.count() == total, s"expected $total exactly-once rows")
    assert(back.select("coin", "open_time").distinct().count() == total,
      "duplicate (coin, open_time) rows after replay")
    val epochs = markerCount
    assert(epochs >= 100, s"soak must span >=100 micro-batches, got $epochs")
    // spot-check the stream actually enriched (not just passed through)
    assert(back.filter(col("spread") < 0).isEmpty)
  }
}
