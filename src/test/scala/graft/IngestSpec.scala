package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.KlineIngest

/** Pins the reference's ingest semantics (SURVEY.md §1.2, §2.3):
  * PERMISSIVE JSON parse (malformed field → null, never an error),
  * epoch-ms → timestamp conversion, derived year/month.
  */
class IngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def kafkaShaped(values: String*) =
    values.toSeq.toDF("value").select(col("value").cast("binary").as("value"))

  private val good =
    """{"coin":"BTCUSDC","timestamp":1704067200000,"open":1.0,"high":2.0,
      |"low":0.5,"close":1.5,"volume":10.0,"close_time":1704067259999,
      |"quote_asset_volume":15.0,"number_of_trades":7,
      |"taker_buy_base_asset_volume":4.0,"taker_buy_quote_asset_volume":6.0,
      |"ignore":"0","interval":"1m"}""".stripMargin.replaceAll("\n", "")

  test("parse: valid kline JSON → typed row") {
    val row = KlineIngest.parse(kafkaShaped(good)).head()
    assert(row.getAs[String]("coin") == "BTCUSDC")
    assert(row.getAs[Long]("timestamp") == 1704067200000L)
    assert(row.getAs[Double]("close") == 1.5)
    assert(row.getAs[Int]("number_of_trades") == 7)
  }

  test("parse: malformed numeric → null field, row survives (null-on-malformed)") {
    // producer's permissive convert_to_float leaves bad numerics as
    // strings (/root/reference/kafka/producer-longtime.py:23-27)
    val bad = good.replace("\"open\":1.0", "\"open\":\"oops\"")
    val row = KlineIngest.parse(kafkaShaped(bad)).head()
    assert(row.getAs[Any]("open") == null)
    assert(row.getAs[String]("coin") == "BTCUSDC") // other fields intact
  }

  test("parse: garbage line → all-null row, no exception") {
    val rows = KlineIngest.parse(kafkaShaped("not json at all")).collect()
    assert(rows.length == 1 && rows.head.getAs[Any]("coin") == null)
  }

  test("enrich: epoch-ms → timestamp + year/month") {
    val row = KlineIngest.enrich(KlineIngest.parse(kafkaShaped(good)))
      .select(col("timestamp").cast("string"), col("year"), col("month")).head()
    assert(row.getString(0) == "2024-01-01 00:00:00") // UTC session
    assert(row.getInt(1) == 2024 && row.getInt(2) == 1)
  }

  test("kafka source options match the reference's golden values exactly") {
    // the connector jar is absent, so .load() can't execute here —
    // golden-pin the option map fromKafka passes to it. Kafka's option
    // parsing ignores unknown keys, so a typo ("subscribes",
    // "startingOffset") would ship silently without this.
    assert(KlineIngest.kafkaSourceOptions("broker:9092", "klines") == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "klines",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false"))
  }
}
