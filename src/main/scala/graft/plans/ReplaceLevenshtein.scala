package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.LevWithinExpr

/** Optimizer rule: thresholded Levenshtein → the bit-parallel kernel.
  *
  * Plain SQL users write `levenshtein(a, b) <= 2` (or call the
  * built-in threshold form `levenshtein(a, b, 2)`); this rule swaps in
  * [[LevWithinExpr]] — the Myers bitvector kernel, ~20× cheaper per
  * pair on ASCII — without the query changing at all:
  *
  *  - `levenshtein(a, b, k)`            → `graft_lev_within(a, b, k)`
  *    (contracts are identical: distance if ≤ k, else -1);
  *  - `levenshtein(a, b) <= k`          → `graft_lev_within(a, b, k) >= 0`
  *    (the unbounded distance is computed only to be compared — the
  *    bound makes it a threshold query);
  *  - `levenshtein(a, b) < k`           → threshold k-1.
  *
  * Only literal non-negative int bounds are rewritten. Injected via
  * `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]).
  */
object ReplaceLevenshtein extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Levenshtein(l, r, Some(Literal(k: Int, IntegerType))) if k >= 0 =>
        LevWithinExpr(l, r, k)
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        GreaterThanOrEqual(LevWithinExpr(l, r, k), Literal(0))
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        GreaterThanOrEqual(LevWithinExpr(l, r, k - 1), Literal(0))
    }
}
