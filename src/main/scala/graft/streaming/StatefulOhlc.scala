package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: a running OHLC/volume rollup per
  * (coin, interval) maintained with `flatMapGroupsWithState` — the
  * README's "statistics of coin volume over the last hour" as a live
  * incremental view rather than a per-batch re-aggregation
  * (SURVEY.md §2.8: the reference never implements it).
  *
  * State is one tiny summary per key, hash-partitioned across
  * executors by the group key and bounded by processing-time timeout —
  * the 100 TB posture for keyed state (no unbounded growth, no
  * driver-side dict like the reference's `timestamps.json`).
  */
object StatefulOhlc {

  case class Tick(coin: String, interval: String, ts: Long, price: Double,
                  volume: Double)

  case class OhlcState(openTs: Long, open: Double, high: Double, low: Double,
                       close: Double, closeTs: Long, volume: Double, n: Long)

  case class OhlcUpdate(coin: String, interval: String, open: Double,
                        high: Double, low: Double, close: Double,
                        volume: Double, n: Long)

  private def merge(s: OhlcState, t: Tick): OhlcState =
    OhlcState(
      openTs = math.min(s.openTs, t.ts),
      open = if (t.ts < s.openTs) t.price else s.open,
      high = math.max(s.high, t.price),
      low = math.min(s.low, t.price),
      close = if (t.ts >= s.closeTs) t.price else s.close,
      closeTs = math.max(s.closeTs, t.ts),
      volume = s.volume + t.volume,
      n = s.n + 1)

  private def init(t: Tick): OhlcState =
    OhlcState(t.ts, t.price, t.price, t.price, t.price, t.ts, t.volume, 1L)

  /** One update row per key per micro-batch. `stateTtl = Some(d)`
    * expires idle keys after `d` of processing-time inactivity —
    * deploy with a periodic trigger there; with the default ASAP
    * trigger, timeout evaluation re-arms continuously and
    * `processAllAvailable` never settles, so TTL is opt-in.
    */
  def updates(ticks: Dataset[Tick],
              stateTtl: Option[String] = None): Dataset[OhlcUpdate] = {
    implicit val stateEnc = Encoders.product[OhlcState]
    implicit val outEnc = Encoders.product[OhlcUpdate]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)

    def step(key: (String, String), rows: Iterator[Tick],
             state: GroupState[OhlcState]): Iterator[OhlcUpdate] =
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val merged = rows.foldLeft(state.getOption.orNull) { (s, t) =>
          if (s == null) init(t) else merge(s, t)
        }
        if (merged == null) Iterator.empty
        else {
          state.update(merged)
          stateTtl.foreach(state.setTimeoutDuration)
          Iterator.single(OhlcUpdate(key._1, key._2, merged.open,
            merged.high, merged.low, merged.close, merged.volume, merged.n))
        }
      }

    val timeout = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    ticks
      .groupByKey(t => (t.coin, t.interval))
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(step)
  }
}
