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
      .groupBy(col("_lid") +: left.columns.map(col): _*)
      .agg(count(col("_rt")).as("n_in_window"))
      .drop("_lid")
  }
}
