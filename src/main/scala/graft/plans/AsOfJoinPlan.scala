package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension for the backward as-of join —
  * the (c) rung of the extension ladder (SURVEY.md §4.4): a custom
  * logical node, a planner [[SparkStrategy]], and a physical operator,
  * for semantics no built-in node expresses as one operator.
  *
  * The logical node carries resolved attributes (it is built from
  * analyzed child plans by `ops.AsOfJoin.native`), so analysis is a
  * pass-through; Catalyst still optimizes the CHILDREN (pushdown,
  * pruning into the scans) because they are ordinary plans.
  *
  * The physical operator is a co-partitioned streaming merge:
  *
  *  - `requiredChildDistribution` clusters both sides on the join
  *    keys — EnsureRequirements inserts (or reuses!) the exchanges,
  *    so an input already hash-partitioned on the key shuffles ZERO
  *    rows, which the union-window form can never do (its union must
  *    re-shuffle everything);
  *  - `requiredChildOrdering` sorts each side by (keys, time) —
  *    right additionally by tiebreak, so "last row seen" IS the
  *    max-tiebreak duplicate — and the merge is then a single O(n+m)
  *    forward pass per partition holding ONE buffered row, no window
  *    state, no pair explosion;
  *  - left row order and partitioning are preserved and advertised
  *    (`outputPartitioning`/`outputOrdering`), so a downstream
  *    keyed aggregation or second as-of join on the same key plans
  *    with NO further exchange.
  *
  * At 100 TB that is at most one exchange of each input, the same
  * lower bound as any keyed join, with sorts that spill via the
  * standard UnsafeExternalSorter path. Semantics match
  * `AsOfJoin.backward` exactly (`JoinOpsSpec` property-checks parity):
  * greatest rightTime <= leftTime per key, max-tiebreak on equal
  * times, optional tolerance nulling, null keys grouped like any
  * grouping key. Time and tiebreak values must be non-null longs
  * (the API wrapper casts).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    tiebreak: Attribute,
    tolerance: Option[Long],
    asofTimeOut: AttributeReference,
    payloadOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ (asofTimeOut +: payloadOut)

  // the match columns are introduced here, not read from a child
  override def producedAttributes: AttributeSet =
    AttributeSet(asofTimeOut +: payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]; registered through
  * `GraftExtensions` (SQL sessions) and `GraftPlanBridge
  * .ensureStrategy` (any session the DataFrame API touches). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, n.tiebreak, n.tolerance, n.asofTimeOut +: n.payloadOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join (see [[AsOfJoinNode]] scaladoc for
  * the distribution/ordering contract and scale argument). */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    tiebreak: Expression,
    tolerance: Option[Long],
    matchAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] = left.output ++ matchAttrs

  override def producedAttributes: AttributeSet = AttributeSet(matchAttrs)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(tiebreak, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val tol = tolerance
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTime, rTime, pay) =
      (leftKeys, rightKeys, leftTime, rightTime, payload)
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output
    val nMatch = matchAttrs.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      // match-side output row: (asof_time, payload...) — field 0 doubles
      // as the tolerance probe
      val rMatchProj = UnsafeProjection.create(rTime +: pay, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullMatch = new GenericInternalRow(nMatch)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var held: InternalRow = null    // best match so far (copied)
        private var heldKey: InternalRow = null // its key (copied)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lt = lTimeProj(l).getLong(0)
          val lk = lKeyProj(l)
          // advance the right cursor through every row with
          // key < lk (drop) or key == lk && time <= lt (becomes the
          // held match; sort order makes the last one the greatest
          // (time, tiebreak) pair). Each right row is visited ONCE
          // across the whole partition — the cursor never rewinds.
          var advance = true
          while (advance && rRow != null) {
            val cmp = keyOrd.compare(rKeyProj(rRow), lk)
            if (cmp < 0) rRow = if (rIter.hasNext) rIter.next() else null
            else if (cmp == 0 && rTimeProj(rRow).getLong(0) <= lt) {
              held = rMatchProj(rRow).copy()
              heldKey = lk.copy()
              rRow = if (rIter.hasNext) rIter.next() else null
            } else advance = false
          }
          val matched = held != null && keyOrd.compare(heldKey, lk) == 0 &&
            (tol.isEmpty || held.getLong(0) >= lt - tol.get)
          numOut += 1
          if (matched) { numMatched += 1; resultProj(joined(l, held)) }
          else resultProj(joined(l, nullMatch))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
