package graft.ops

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}

/** As-of (point-in-time) join: for every left row, attach the single
  * right row with the greatest `rightTime <= leftTime` for the same
  * key — the lookup a market-data pipeline does to enrich an event
  * with the latest-known quote (the reference joins each kline batch
  * to per-(coin,interval) destinations by looping;
  * /root/reference/spark/streaming-longtime.py:119-142 — an as-of
  * enrichment is the natural analytical extension of that keyed
  * routing model).
  *
  * Spark has no native ASOF JOIN. The naive formulations do not
  * scale: a range join (`l.key = r.key AND r.t <= l.t`) produces
  * O(|l|·|r|) candidate pairs per key before pruning, and a per-key
  * `collect` is driver-bound. This implementation is the union-window
  * form:
  *
  *   1. tag both inputs and UNION them — no join node at all;
  *   2. ONE hash-partition by key + sort by (time, side) — the same
  *      single shuffle any keyed window costs;
  *   3. a running `last(…, ignoreNulls)` carries the latest right
  *      payload forward into each left row.
  *
  * At 100 TB that is ONE exchange of |left|+|right| rows total (plan-
  * audited: a single hashpartitioning(keys) node), no pair explosion,
  * and skewed keys are handled by AQE like any other window.
  * Duplicate right rows at one (key, time) resolve to the max-
  * `tiebreak` row deterministically — the dedup is folded into the
  * window sort order rather than a separate aggregation shuffle.
  */
object AsOfJoin {

  /** Backward as-of join (the common "latest state at event time").
    *
    * @param left       probe side; all its columns are preserved
    * @param right      reference side
    * @param keys       equi-join key columns (present on both sides)
    * @param leftTime   left event-time column (integral, e.g. epoch ms)
    * @param rightTime  right event-time column (same unit)
    * @param payload    right columns to carry (null when no match);
    *                   names must not collide with left columns
    * @param tiebreak   right column ordering duplicates at the same
    *                   (key, time): the row with the max value wins
    * @param tolerance  max allowed leftTime - rightTime; matches older
    *                   than this yield null payload (None = unbounded)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], tiebreak: String,
               tolerance: Option[Long] = None): DataFrame = {
    val matchedTime = "_asof_t"
    val rightTagged = right.select(
      keys.map(col) :+ col(rightTime).as(matchedTime) :+
        struct(payload.map(col): _*).as("_p") :+ col(tiebreak).as("_tb"): _*)
      .withColumn("_side", lit(0))

    val tagged = left.withColumn("_side", lit(1))
      .unionByName(rightTagged, allowMissingColumns = true)

    // Sort (time, side, tiebreak): right (side 0) sorts before left
    // (side 1) at equal time ⇒ a right row AT the left row's time
    // matches (<= semantics). Duplicate right rows at one (key, time)
    // sort tiebreak-ascending, so the running last() lands on the
    // max-tiebreak survivor — dedup rides the window's own sort
    // instead of costing a separate groupBy exchange.
    val order = when(col("_side") === 0, col(matchedTime)).otherwise(col(leftTime))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = tagged
      .withColumn("_m", last(
        when(col("_side") === 0, struct(col(matchedTime) +: payload.map(c => col("_p")(c).as(c)): _*)),
        ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val inRange = tolerance match {
      case Some(tol) => col("_m").isNotNull &&
        col("_m")(matchedTime) >= col(leftTime) - tol
      case None => col("_m").isNotNull
    }
    val out = carried.withColumn("_m", when(inRange, col("_m")))
    out.select(left.columns.toSeq.map(col) ++
      (matchedTime +: payload).map(c => col("_m")(c).as(c)): _*)
      .withColumnRenamed(matchedTime, "asof_time")
  }

  /** Backward as-of join through the custom whole-operator path
    * (`plans.AsOfJoinNode` / `AsOfJoinExec`): co-partitioned sorted
    * merge instead of the union-window carry. Result-identical to
    * [[backward]] for integral time columns (property-checked in
    * `JoinOpsSpec`); prefer this form when an input is already
    * partitioned on the key (its exchange is reused — the union form
    * always re-shuffles both) or when the left row width is large (no
    * window state carries whole rows). The merge orders on long epoch
    * values: non-long time columns are cast INTERNALLY (left columns
    * pass through unchanged), and `asof_time` is exported as the
    * matched right time's long epoch value. `rightTime` and
    * `tiebreak` must be non-null.
    *
    * Output: all left columns, then `asof_time` (null when no match)
    * and the payload columns — same contract as [[backward]].
    *
    * `direction` extends the match rule beyond backward (see
    * `AsOfJoinExec`): "forward" = smallest rightTime >= leftTime,
    * "nearest" = min |rightTime − leftTime| with ties to the backward
    * side; tolerance bounds the signed (backward/forward) or absolute
    * (nearest) distance. All directions share the one-exchange,
    * single-pass merge.
    */
  def native(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTime: String, rightTime: String,
             payload: Seq[String], tiebreak: String,
             tolerance: Option[Long] = None,
             direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction' (backward|forward|nearest)")
    GraftPlanBridge.ensureStrategy(spark, AsOfJoinStrategy)
    // the epoch cast rides on hidden columns so the caller's time
    // columns keep their type in the output (the hidden left column is
    // dropped below; the right side never surfaces)
    val ltCol = "_graft_asof_lt"
    val rtCol = "_graft_asof_rt"
    require(!left.columns.contains(ltCol) && !right.columns.contains(rtCol),
      s"as-of inputs must not already carry the internal columns $ltCol/$rtCol")
    // the output appends asof_time + payload to ALL left columns; a name
    // collision would emit duplicate attributes that fail (or silently
    // mis-bind) only at the first downstream resolution — fail fast here
    val clash = ("asof_time" +: payload).filter(left.columns.contains)
    require(clash.isEmpty,
      s"as-of left side already has output column(s) ${clash.mkString(", ")}; " +
        "rename them or the payload before joining")
    val l = left.withColumn(ltCol, col(leftTime).cast(LongType))
    val r = right.withColumn(rtCol, col(rightTime).cast(LongType))
    // shield each side behind a fresh aliasing Project: when both
    // sides derive from the same relation, the analyzer's
    // DeduplicateRelations renews the duplicated subtree's exprIds —
    // a rewrite it can apply inside known nodes (the Project) but not
    // to the attributes this custom node captured. With the shield,
    // the captured attributes are the alias outputs, which the
    // rewrite never touches.
    def shield(p: LogicalPlan): LogicalPlan =
      Project(p.output.map(a => Alias(a, a.name)()), p)
    val lPlan = shield(l.queryExecution.analyzed)
    val rPlan = shield(r.queryExecution.analyzed)
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of $side side has no column '$n' (has: ${p.output.map(_.name).mkString(", ")})"))
    val payloadOut = payload.map { p =>
      val a = attr(rPlan, p, "right")
      AttributeReference(p, a.dataType, nullable = true)()
    }
    val asofOut = AttributeReference("asof_time", LongType, nullable = true)()
    GraftPlanBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _, "left")), keys.map(attr(rPlan, _, "right")),
      attr(lPlan, ltCol, "left"), attr(rPlan, rtCol, "right"),
      payload.map(attr(rPlan, _, "right")), attr(rPlan, tiebreak, "right"),
      tolerance, asofOut, payloadOut, direction)).drop(ltCol)
  }
}
