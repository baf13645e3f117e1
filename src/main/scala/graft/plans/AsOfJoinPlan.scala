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
    payloadOut: Seq[AttributeReference],
    direction: String = "backward") extends BinaryNode {

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
        planLater(n.left), planLater(n.right), n.direction) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join (see [[AsOfJoinNode]] scaladoc for the
  * distribution/ordering contract and scale argument).
  *
  * `direction` selects the match rule per left row (same key):
  *  - `backward`: greatest rightTime <= leftTime (max tiebreak at the
  *    matched time); tolerance bounds leftTime − rightTime.
  *  - `forward`: smallest rightTime >= leftTime (max tiebreak at the
  *    matched time); tolerance bounds rightTime − leftTime.
  *  - `nearest`: whichever of the two candidates minimizes
  *    |rightTime − leftTime|, ties to the backward side; a right row
  *    AT the left time matches with distance 0. Tolerance bounds the
  *    absolute distance (each candidate is dropped independently
  *    before the comparison, so an in-tolerance far-side match still
  *    wins when the near side is out of tolerance).
  *
  * All three run in the same single forward pass per partition: the
  * right cursor never rewinds; forward/nearest additionally buffer the
  * current right tie-group's winner (one projected row), so memory
  * stays O(1) per partition regardless of duplicates.
  */
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
    right: SparkPlan,
    direction: String = "backward") extends BinaryExecNode {

  require(Set("backward", "forward", "nearest")(direction),
    s"unknown as-of direction '$direction'")

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
    val dir = direction
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
      // as the tolerance/distance probe
      val rMatchProj = UnsafeProjection.create(rTime +: pay, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullMatch = new GenericInternalRow(nMatch)
      val joined = new JoinedRow

      def emit(l: InternalRow, m: InternalRow): InternalRow = {
        numOut += 1
        if (m != null) { numMatched += 1; resultProj(joined(l, m)) }
        else resultProj(joined(l, nullMatch))
      }

      if (dir == "backward") new Iterator[InternalRow] {
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
          emit(l, if (matched) held else null)
        }
      }
      else new Iterator[InternalRow] {
        // forward / nearest. Invariants per left row (lk, lt), with
        // left ascending by (key, time) and right by (key, time, tb):
        //  - `held`   = backward candidate: the greatest-(time, tb)
        //               right row with key == heldKey and time < lt
        //               among rows the cursor has passed (strict <:
        //               rows AT lt belong to the forward group, which
        //               matches them at distance 0);
        //  - `fwd`    = the max-tiebreak winner of the right tie-group
        //               at the smallest time >= some earlier lt for
        //               fwdKey; still the forward match while
        //               fwd.time >= lt, and demoted to `held` when the
        //               left side moves past it;
        //  - `rRow`   = first right row after the consumed prefix.
        // Each right row is consumed exactly once; no rewinds.
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var held: InternalRow = null
        private var heldKey: InternalRow = null
        private var fwd: InternalRow = null
        private var fwdKey: InternalRow = null

        private def readNext(): Unit =
          rRow = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lt = lTimeProj(l).getLong(0)
          val lk = lKeyProj(l)
          // 1. demote a stale forward group: same key but now behind
          // the left time → it is the best backward candidate so far
          if (fwd != null) {
            val c = keyOrd.compare(fwdKey, lk)
            if (c < 0) fwd = null // key advanced past it
            else if (c == 0 && fwd.getLong(0) < lt) {
              held = fwd; heldKey = fwdKey
              fwd = null
            }
          }
          // 2. advance the cursor: rows before (lk, lt) refresh the
          // backward candidate; the first tie-group at time >= lt
          // becomes the forward group (its last row = max tiebreak)
          var advance = fwd == null
          while (advance && rRow != null) {
            val c = keyOrd.compare(rKeyProj(rRow), lk)
            if (c < 0) readNext()
            else if (c > 0) advance = false // no right rows for this key yet
            else {
              val rt = rTimeProj(rRow).getLong(0)
              if (rt < lt) {
                held = rMatchProj(rRow).copy(); heldKey = lk.copy()
                readNext()
              } else {
                var winner = rMatchProj(rRow).copy()
                readNext()
                var grouping = true
                while (grouping && rRow != null) {
                  if (keyOrd.compare(rKeyProj(rRow), lk) == 0 &&
                    rTimeProj(rRow).getLong(0) == rt) {
                    winner = rMatchProj(rRow).copy()
                    readNext()
                  } else grouping = false
                }
                fwd = winner; fwdKey = lk.copy()
                advance = false
              }
            }
          }
          // 3. pick the match for this direction
          val fwdOk = fwd != null && keyOrd.compare(fwdKey, lk) == 0 &&
            (tol.isEmpty || fwd.getLong(0) - lt <= tol.get)
          val chosen =
            if (dir == "forward") { if (fwdOk) fwd else null }
            else { // nearest: smaller |Δt| wins, ties to backward
              val bwdOk = held != null && keyOrd.compare(heldKey, lk) == 0 &&
                (tol.isEmpty || lt - held.getLong(0) <= tol.get)
              if (bwdOk && fwdOk) {
                if (lt - held.getLong(0) <= fwd.getLong(0) - lt) held else fwd
              } else if (bwdOk) held
              else if (fwdOk) fwd
              else null
            }
          emit(l, chosen)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
