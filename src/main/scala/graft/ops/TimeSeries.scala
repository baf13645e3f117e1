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
    * and left-join onto the dense bucket grid between the global min
    * and max bucket: (k, bucket, v_micro nullable, n_obs). */
  private def densify(df: DataFrame, key: Column, ts: Column,
                      valueMicro: Column, interval: String): DataFrame = {
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

    spine.join(bucketed, Seq("k", "bucket"), "left")
  }

  /** Densify and forward-fill.
    *
    * Output: key, bucket (timestamp), valueMicro (null only before a
    * key's first observation), n_obs (0 on gap rows), is_gap.
    */
  def gapFillFF(df: DataFrame, key: Column, ts: Column, valueMicro: Column,
                interval: String): DataFrame = {
    val ff = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    densify(df, key, ts, valueMicro, interval)
      .select(col("k"), col("bucket"),
        last(col("v_micro"), ignoreNulls = true).over(ff).as("v_micro"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("n_obs").isNull.as("is_gap"))
  }

  /** Densify and linearly interpolate gap buckets between their
    * nearest observed neighbors; buckets before the first or after the
    * last observation stay null (interpolation, not extrapolation).
    * One extra window direction vs [[gapFillFF]] — still a single
    * shuffle, both window passes share the (k → bucket) Sort.
    *
    * Output: key, bucket_ms (epoch ms), v (value units: observed
    * buckets exact micro/1e6, gap buckets round(lerp, 6)), is_obs.
    */
  def interpolate(df: DataFrame, key: Column, ts: Column, valueMicro: Column,
                  interval: String): DataFrame = {
    val back = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val obsT = when(col("v_micro").isNotNull, col("b_ms"))
    densify(df, key, ts, valueMicro, interval)
      .withColumn("b_ms", unix_millis(col("bucket")))
      .select(col("k"), col("b_ms"), col("v_micro"),
        last(col("v_micro"), ignoreNulls = true).over(back).as("pv"),
        last(obsT, ignoreNulls = true).over(back).as("pt"),
        first(col("v_micro"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsT, ignoreNulls = true).over(fwd).as("nt"))
      .select(col("k"), col("b_ms").as("bucket_ms"),
        when(col("v_micro").isNotNull,
            col("v_micro").cast("double") / 1000000.0)
          .when(col("pv").isNotNull && col("nv").isNotNull,
            round((col("pv").cast("double") +
              (col("nv").cast("double") - col("pv").cast("double")) *
                ((col("b_ms") - col("pt")).cast("double") /
                  (col("nt") - col("pt")).cast("double"))) / 1000000.0, 6))
          .as("v"),
        col("v_micro").isNotNull.as("is_obs"))
  }
}
