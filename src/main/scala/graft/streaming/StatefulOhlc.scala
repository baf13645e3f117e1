package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** The same rollup on Spark 4's arbitrary-stateful-processing v2
    * (`transformWithState` + typed [[ValueState]]): per-key state
    * lives in the RocksDB state store (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...RocksDBStateStoreProvider` — required by this operator), so
    * state size is bounded by disk, not executor heap, and TTL is a
    * store-native config instead of hand-rolled timeout plumbing —
    * the preferred shape for new keyed-state operators.
    */
  private class OhlcProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(String, String), Tick, OhlcUpdate] {
    @transient private var state: ValueState[OhlcState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OhlcState](
        "ohlc", Encoders.product[OhlcState], ttl)

    override def handleInputRows(key: (String, String), rows: Iterator[Tick],
                                 timerValues: TimerValues): Iterator[OhlcUpdate] = {
      val merged = rows.foldLeft(if (state.exists()) state.get() else null) {
        (s, t) => if (s == null) StatefulOhlc.init(t) else merge(s, t)
      }
      if (merged == null) Iterator.empty
      else {
        state.update(merged)
        Iterator.single(OhlcUpdate(key._1, key._2, merged.open,
          merged.high, merged.low, merged.close, merged.volume, merged.n))
      }
    }
  }

  /** [[updates]] via `transformWithState`; `stateTtl` expires idle
    * keys by store-native processing-time TTL. */
  def updatesTws(ticks: Dataset[Tick],
                 stateTtl: Option[java.time.Duration] = None): Dataset[OhlcUpdate] = {
    implicit val outEnc: Encoder[OhlcUpdate] = Encoders.product[OhlcUpdate]
    implicit val keyEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val ttl = stateTtl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    ticks
      .groupByKey(t => (t.coin, t.interval))
      .transformWithState(new OhlcProcessor(ttl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }
}
