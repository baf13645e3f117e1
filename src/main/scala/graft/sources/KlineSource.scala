package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source standing in for the reference's REST
  * kline poller (`/root/reference/kafka/producer-longtime.py:73-114`:
  * 4 coins × 5 intervals fetched in parallel, ≤500 rows per fetch) —
  * re-expressed as an ENGINE-NATIVE source so Spark plans the
  * parallelism instead of a thread pool:
  *
  *  - one `InputPartition` per (coin, ≤chunk-rows window) — the unit
  *    the reference fetches per HTTP call becomes the unit Spark
  *    schedules, so a 1000-executor cluster fans the "fetches" out
  *    with locality-free scheduling and speculative retry for free;
  *  - column pruning (`SupportsPushDownRequiredColumns`) reaches the
  *    row generator — unprojected fields are never materialized;
  *  - `open_time` range filters (`SupportsPushDownFilters`) prune
  *    whole partitions at PLANNING time — the incremental-poll
  *    "only fetch past the watermark" pattern
  *    (`streaming-longtime-raw.py:132-137`) without a driver-side
  *    timestamp file.
  *
  * Rows are a deterministic hash-walk per (coin, index): reads are
  * reproducible anywhere, like every other graft fixture path.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-klines")
  *   .option("coins", "BTC,ETH").option("interval", "1m")
  *   .option("startMs", 1704067200000L).option("rows", 10000)
  *   .option("chunkRows", 500)
  *   .load()
  * }}}
  */
class KlineSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-klines"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KlineSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KlineTable(new CaseInsensitiveStringMap(properties))
}

object KlineSource {
  val Schema: StructType = StructType(Seq(
    StructField("coin", StringType, nullable = false),
    StructField("interval", StringType, nullable = false),
    StructField("open_time", LongType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  private[sources] val IntervalMs: Map[String, Long] = Map(
    "1s" -> 1000L, "1m" -> 60000L, "5m" -> 300000L,
    "1h" -> 3600000L, "1d" -> 86400000L)

  /** Deterministic per-(coin, idx) pseudo-random in [0, 1). */
  private[sources] def unit(coin: String, idx: Long, salt: Long): Double = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < coin.length) { h = (h ^ coin.charAt(i)) * 0x100000001b3L; i += 1 }
    h = (h ^ idx) * 0x100000001b3L
    h = (h ^ salt) * 0x100000001b3L
    // xorshift finalize, top 53 bits → double
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }
}

private class KlineTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_klines"
  override def schema(): StructType = KlineSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new KlineScanBuilder(options)
}

private class KlineScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = KlineSource.Schema
  private var pushed: Array[Filter] = Array.empty
  // planning-time partition pruning bounds on open_time
  private var minTime: Long = Long.MinValue
  private var maxTime: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("open_time", _: java.lang.Long) => true
      case LessThan("open_time", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("open_time", v: java.lang.Long) =>
        minTime = math.max(minTime, v)
      case LessThan("open_time", v: java.lang.Long) =>
        maxTime = math.min(maxTime, v)
      case _ => ()
    }
    pushed = accepted
    // accepted bounds prune partitions but rows at chunk edges still
    // need the engine-side filter — report everything as residual
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new KlineScan(options, required, minTime, maxTime)
}

/** Stream position: klines emitted so far PER COIN (uniform index —
  * one long is the whole frontier). JSON form lives in the query
  * checkpoint, which is what makes restarts exactly-once: the
  * reference's poll loop re-fetches overlapping windows and stores
  * duplicates; here the committed offset IS the dedup.
  */
private case class KlineOffset(idx: Long) extends Offset {
  override def json(): String = s"""{"idx":$idx}"""
}

private case class KlineChunk(coin: String, interval: String,
    startIdx: Long, rows: Int, startMs: Long, stepMs: Long)
  extends InputPartition

private class KlineScan(options: CaseInsensitiveStringMap,
    required: StructType, minTime: Long, maxTime: Long)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KlineMicroBatchStream(options, required)
  override def description(): String =
    s"graft-klines pruned=[${required.fieldNames.mkString(",")}] " +
      s"time=[$minTime,$maxTime)"

  override def planInputPartitions(): Array[InputPartition] = {
    val coins = options.getOrDefault("coins", "BTC,ETH,BNB,SOL")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val interval = options.getOrDefault("interval", "1m")
    val step = KlineSource.IntervalMs.getOrElse(interval,
      throw new IllegalArgumentException(s"unknown interval $interval"))
    val startMs = options.getLong("startMs", 1704067200000L)
    val rows = options.getLong("rows", 500L)
    val chunk = options.getInt("chunkRows", 500)
    val parts = for {
      coin <- coins.toSeq
      first <- 0L until rows by chunk.toLong
      n = math.min(chunk.toLong, rows - first).toInt
      // planning-time pruning: drop chunks wholly outside the pushed
      // open_time bounds
      chunkStart = startMs + first * step
      chunkEnd = chunkStart + n * step
      if chunkEnd > minTime && chunkStart < maxTime
    } yield KlineChunk(coin, interval, first, n, startMs, step)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KlineReaderFactory(required.fieldNames)
}

/** The reference's continuous poll loop as a first-class streaming
  * source: each trigger "fetches" the next `pollRows` klines per coin
  * (the producer's ≤500-row REST page), planned as one partition per
  * coin per micro-batch. Offsets checkpoint through the engine, so a
  * restart resumes exactly after the last committed row — no
  * overlapping-fetch duplicates to scrub downstream.
  */
private class KlineMicroBatchStream(options: CaseInsensitiveStringMap,
    required: StructType) extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val coins = options.getOrDefault("coins", "BTC,ETH,BNB,SOL")
    .split(",").map(_.trim).filter(_.nonEmpty)
  private val interval = options.getOrDefault("interval", "1m")
  private val step = KlineSource.IntervalMs.getOrElse(interval,
    throw new IllegalArgumentException(s"unknown interval $interval"))
  private val startMs = options.getLong("startMs", 1704067200000L)
  private val pollRows = options.getLong("pollRows", 500L)
  // bounded feeds let tests drain the stream; defaults to unbounded
  private val maxRows = options.getLong("rows", Long.MaxValue)

  override def initialOffset(): Offset = KlineOffset(0L)
  override def deserializeOffset(json: String): Offset = {
    val idx = json.replaceAll("[^0-9]", "")
    KlineOffset(if (idx.isEmpty) 0L else idx.toLong)
  }
  // admission control: each micro-batch admits one REST-page worth
  // (`pollRows`) per coin — the engine commits exactly the offset we
  // return, so restart resumes with nothing skipped or repeated
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KlineOffset].idx
    KlineOffset(math.min(maxRows, s + pollRows))
  }
  override def reportLatestOffset(): Offset = KlineOffset(maxRows)

  // Trigger.AvailableNow: without this marker Spark silently falls
  // back to SINGLE-batch execution ("does not support
  // Trigger.AvailableNow" warning) — the admission-controlled
  // micro-batch loop never runs. The drain target here is static
  // (`rows`, fixed at construction), so prepare has nothing to
  // snapshot; latestOffset keeps admitting pollRows per trigger until
  // it reaches maxRows and the engine stops. A `rows`-unbounded
  // stream must not use AvailableNow (it would never drain) — that is
  // the poll-forever deployment shape, which runs the default
  // processing-time trigger.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KlineOffset].idx
    val e = end.asInstanceOf[KlineOffset].idx
    if (e <= s) Array.empty
    else coins.map(c =>
      KlineChunk(c, interval, s, (e - s).toInt, startMs, step): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KlineReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class KlineReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KlineReader(p.asInstanceOf[KlineChunk], fields)
}

/** Generates the chunk's rows; only the pruned-to columns are computed.
  * Per-chunk constants (the coin's base level, the interned coin/
  * interval strings) and the column dispatch are resolved ONCE here —
  * this is the throughput-bench hot path, so get() must not re-hash
  * the coin or re-match column names per row.
  */
private class KlineReader(chunk: KlineChunk, fields: Array[String])
    extends PartitionReader[InternalRow] {
  import KlineSource.unit
  private var i = -1
  private val base = 100.0 * (1.0 + unit(chunk.coin, 0L, 7L)) // per-coin level
  private val coinU = UTF8String.fromString(chunk.coin)
  private val intervalU = UTF8String.fromString(chunk.interval)

  // column names resolved to ordinals once per partition; the shared
  // open/close pair is computed once per ROW, only when a price
  // column survives pruning
  private val codes: Array[Int] = fields.map {
    case "coin" => 0
    case "interval" => 1
    case "open_time" => 2
    case "open" => 3
    case "high" => 4
    case "low" => 5
    case "close" => 6
    case "volume" => 7
    case other => throw new IllegalStateException(s"unknown column $other")
  }
  private val needsPrice = codes.exists(c => c >= 3 && c <= 6)

  override def next(): Boolean = { i += 1; i < chunk.rows }

  override def get(): InternalRow = {
    val idx = chunk.startIdx + i
    var o = 0.0
    var c = 0.0
    if (needsPrice) {
      o = base * (1.0 + 0.1 * (unit(chunk.coin, idx, 1L) - 0.5))
      c = base * (1.0 + 0.1 * (unit(chunk.coin, idx, 2L) - 0.5))
    }
    val values = new Array[Any](codes.length)
    var j = 0
    while (j < codes.length) {
      values(j) = codes(j) match {
        case 0 => coinU
        case 1 => intervalU
        case 2 => chunk.startMs + idx * chunk.stepMs
        case 3 => o
        case 4 => math.max(o, c) * 1.01
        case 5 => math.min(o, c) * 0.99
        case 6 => c
        case 7 => 1000.0 * unit(chunk.coin, idx, 3L)
      }
      j += 1
    }
    // wrap the array directly — fromSeq(toIndexedSeq) would copy twice
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
