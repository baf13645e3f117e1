package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: aggregate, for every left row, the right rows
  * with the same key whose time falls in `(leftTime - window,
  * leftTime]` — "how many clicks did this user make in the hour
  * before this purchase".
  *
  * A direct theta-join on the range predicate degenerates to a
  * per-key nested loop (Spark plans it as BroadcastNestedLoopJoin or
  * a storm of post-filtered pairs). The banded form keeps it an
  * equi-join: right rows land in time buckets of `window` width, and
  * each left row probes exactly TWO buckets (its own and the
  * previous — any right row within `window` of t lies in one of
  * them), then the exact range predicate prunes the band edges.
  * Cost at 100 TB: a hash join on (key, bucket) with fan-out 2 on the
  * probe side — shuffle volume 2·|left| + |right|, never |left|·|right|.
  */
object RangeJoin {

  /** Count right-side rows per left row within the trailing window.
    * `leftTime`/`rightTime` are integral (epoch ms); output keeps all
    * left columns plus `n_in_window` (0 when no match).
    */
  def countInWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    windowMs: Long): DataFrame = {
    require(keys.nonEmpty, "countInWindow needs at least one join key")
    val rKeys = keys.map(k => col(k).as(s"_r_$k"))
    val r = right.select(rKeys :+ col(rightTime).as("_rt"): _*)
      .withColumn("_rbkt", expr(s"_rt div $windowMs"))
    // synthetic row id: grouping on the left columns alone would
    // collapse duplicate left rows and sum their window counts
    val l = left
      .withColumn("_lid", monotonically_increasing_id())
      .withColumn("_lbkt", expr(s"$leftTime div $windowMs"))
      .withColumn("_bkt", explode(array(col("_lbkt") - 1, col("_lbkt"))))
    val cond: Column = keys.map(k => col(k) === col(s"_r_$k"))
      .reduce(_ && _) && col("_bkt") === col("_rbkt") &&
      col("_rt") > col(leftTime) - windowMs && col("_rt") <= col(leftTime)
    l.join(r, cond, "left_outer")
      .groupBy((col("_lid") +: left.columns.toSeq.map(col)): _*)
      .agg(count(col("_rt")).as("n_in_window"))
      .drop("_lid")
  }

  /** Point-in-interval membership join: pairs of (point row, interval
    * row) of the same key where `start ≤ pointTime ≤ end` (inclusive)
    * — "which error windows was this purchase inside". The third
    * member of the banded range-join family: [[countInWindow]] anchors
    * the interval at the point (trailing window),
    * [[intervalOverlapSelfPairs]] joins intervals to intervals, this
    * joins an interval TABLE to a point TABLE.
    *
    * Banding: intervals emit their covered buckets (fan-out
    * `len/bucketWidth + 1`), points land in exactly ONE bucket, and
    * the equi-join on (key, bucket) meets every containing interval
    * there — a point lives in one bucket, so no pair can be emitted
    * twice and no canonical-bucket rule is needed. Cost at 100 TB:
    * shuffle `|points| + (len/W+1)·|intervals|` rows, never the
    * nested-loop |points|·|intervals|.
    *
    * NULL-bounded intervals and NULL-time points are dropped (not
    * intervals/points); a reversed interval fails loudly (see
    * [[intervalOverlapSelfPairs]]). Output: keys, the point id/time,
    * the interval id/bounds.
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], pointId: String, pointTime: String,
                        intervalId: String, startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(keys.nonEmpty,
      "pointsInIntervals needs at least one join key (an un-keyed " +
        "containment join would reduce over an empty predicate list)")
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(keys.map(k => col(k).as(s"_i_$k")) ++ Seq(
        col(intervalId).as(s"i_$intervalId"), col(startCol).as("_s"),
        when(col(startCol) <= col(endCol), col(endCol))
          .otherwise(raise_error(concat(
            lit(s"pointsInIntervals: end < start for $intervalId="),
            col(intervalId).cast("string")))).as("_e")): _*)
      .withColumn("_ibkt",
        explode(sequence(expr(s"_s div $bucketWidth"), expr(s"_e div $bucketWidth"))))
    val pt = points
      .filter(col(pointTime).isNotNull)
      .select(keys.map(col) ++ Seq(col(pointId).as(s"p_$pointId"),
        col(pointTime).as("_t")): _*)
      .withColumn("_pbkt", expr(s"_t div $bucketWidth"))
    val cond = keys.map(k => col(k) === col(s"_i_$k"))
      .reduce(_ && _) && col("_pbkt") === col("_ibkt") &&
      col("_s") <= col("_t") && col("_t") <= col("_e")
    pt.join(iv, cond)
      .select(keys.map(col) ++ Seq(col(s"p_$pointId"), col("_t").as(pointTime),
        col(s"i_$intervalId"), col("_s").as(startCol), col("_e").as(endCol)): _*)
  }

  /** Same-key pairs of rows whose `[start, end]` intervals overlap
    * (both bounds inclusive, integral units) — "which of this
    * customer's orders had overlapping fulfillment windows".
    *
    * The banding that keeps [[countInWindow]] an equi-join extends to
    * interval×interval: every interval emits the buckets it covers
    * (fan-out `len/bucketWidth + 1`, so pick the width at or above the
    * typical interval length), candidates join on (key, bucket), and
    * a pair colliding in SEVERAL shared buckets is emitted exactly
    * once by the canonical-bucket rule — only the bucket containing
    * `max(a.start, b.start)` emits, a point that any overlapping pair
    * shares by definition — rather than deduped with a second shuffle
    * after the fact. Cost at 100 TB: shuffle `(len/W+1)·n` rows, pair
    * work bounded per (key, bucket), never |n|² and never a
    * post-filtered nested loop.
    *
    * `df` must carry `keys`, a unique integral `idCol` (pair order +
    * self-pair exclusion), and integral `startCol`/`endCol`. Output:
    * keys, `a_<id>`/`b_<id>` with a < b, both intervals, and the
    * overlap length `min(end) - max(start)` (≥ 0).
    */
  def intervalOverlapSelfPairs(df: DataFrame, keys: Seq[String], idCol: String,
                               startCol: String, endCol: String,
                               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = df
      // NULL-bounded rows never were intervals: drop them (the
      // pre-guard behavior — sequence(NULL) yielded NULL and explode
      // dropped the row), don't let them reach the reversed-interval
      // guard and abort the job with a wrong diagnostic
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(
        keys.map(col) ++ Seq(col(idCol), col(startCol).as("_s"),
          // a reversed interval must fail LOUDLY: sequence() would
          // silently generate a DESCENDING bucket range, landing the
          // row in buckets it never covers and emitting
          // negative-overlap pairs in violation of the output contract
          when(col(startCol) <= col(endCol), col(endCol))
            .otherwise(raise_error(concat(
              lit(s"intervalOverlapSelfPairs: end < start for $idCol="),
              col(idCol).cast("string")))).as("_e")): _*)
    val banded = base.withColumn("_bkt",
      explode(sequence(expr(s"_s div $bucketWidth"), expr(s"_e div $bucketWidth"))))
    def side(p: String) = banded.select(
      keys.map(col) ++ Seq(col("_bkt"), col(idCol).as(s"${p}_$idCol"),
        col("_s").as(s"${p}_s"), col("_e").as(s"${p}_e")): _*)
    // explicit numbered repartition on the join key (see
    // Dedup.embeddingNearDupsAnn): AQE sees only the banded exchange
    // bytes, not the pair fan-out inside the join, and would coalesce
    // the enumeration onto a few cores
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val joinKeys = keys :+ "_bkt"
    side("a").repartition(nParts, joinKeys.map(col): _*)
      .join(side("b").repartition(nParts, joinKeys.map(col): _*), joinKeys)
      .filter(col(s"a_$idCol") < col(s"b_$idCol") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("_bkt") === expr(s"greatest(a_s, b_s) div $bucketWidth"))
      .select(keys.map(col) ++ Seq(
        col(s"a_$idCol"), col(s"b_$idCol"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_len")): _*)
  }
}
