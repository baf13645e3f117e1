package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: make every (key, bucket) pair
  * exist on a fixed interval grid ("spine"), then carry the last
  * observed value across the gaps.
  *
  * The reference stores whatever buckets the feed happened to deliver
  * (/root/reference/spark/streaming-longtime.py:60-63 derives time
  * parts but never densifies); any downstream chart/model over its
  * tables silently skips missing intervals. Gap-filling is the batch
  * repair for that.
  *
  * Scale shape: the spine is built from ONE global min/max row
  * (single-row broadcast cross join — no driver collect) times the
  * distinct key set, so spine size = |keys| × |buckets|, never
  * |rows|. The forward fill is one window pass partitioned by key —
  * a single shuffle of the (already aggregated) bucket rows, not of
  * the raw events.
  */
object TimeSeries {

  /** Aggregate `valueMicro` (an exact BIGINT measure) per (key, bucket)
    * on `interval`-sized buckets of `ts`, densify onto the full bucket
    * grid between the global min and max bucket, and forward-fill.
    *
    * Output: key, bucket (timestamp), valueMicro (null only before a
    * key's first observation), n_obs (0 on gap rows), is_gap.
    */
  def gapFillFF(df: DataFrame, key: Column, ts: Column, valueMicro: Column,
                interval: String): DataFrame = {
    val bucketed = df
      .groupBy(key.as("k"), date_trunc(interval, ts).as("bucket"))
      .agg(sum(valueMicro).as("v_micro"), count(lit(1)).as("n_obs"))

    // one row: the global grid bounds (exact partial-agg, no collect)
    val bounds = bucketed.agg(
      min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))

    val spine = bucketed.select(col("k")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("k"), explode(
        sequence(col("lo"), col("hi"), expr(s"INTERVAL 1 $interval")))
        .as("bucket"))

    val ff = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    spine.join(bucketed, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        last(col("v_micro"), ignoreNulls = true).over(ff).as("v_micro"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("n_obs").isNull.as("is_gap"))
  }
}
