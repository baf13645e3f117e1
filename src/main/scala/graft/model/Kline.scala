package graft.model

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** The reference's single record type — one Binance candlestick for one
  * (coin, interval) — declared once as a case class instead of the three
  * hand-copied StructTypes in the reference
  * (/root/reference/spark/streaming-longtime.py:29-44,
  *  streaming-shorttime.py:27-42, streaming-longtime-raw.py:32-49).
  *
  * Ingest shape: `timestamp`/`closeTime` are epoch-millis longs exactly
  * as produced on the wire (kafka/producer-longtime.py:42-60); the
  * enriched shape (timestamps + year/month) is derived by
  * [[graft.ingest.KlineIngest.enrich]].
  *
  * All fields are boxed (Option-free but nullable at the Row level via
  * the schema below): the reference parses JSON PERMISSIVE-ly, so a
  * malformed numeric arrives as null — null-on-malformed is the only
  * data error semantics (SURVEY.md §1.2).
  */
final case class Kline(
    coin: String,
    timestamp: java.lang.Long,
    open: java.lang.Double,
    high: java.lang.Double,
    low: java.lang.Double,
    close: java.lang.Double,
    volume: java.lang.Double,
    close_time: java.lang.Long,
    quote_asset_volume: java.lang.Double,
    number_of_trades: java.lang.Integer,
    taker_buy_base_asset_volume: java.lang.Double,
    taker_buy_quote_asset_volume: java.lang.Double,
    ignore: String,
    interval: String
)

object Kline {
  /** Single source of truth for the wire schema. */
  val schema: StructType = Encoders.product[Kline].schema
}
