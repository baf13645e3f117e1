package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TokenCountExpr

/** Optimizer rule: `size(split(text, ' '))` → [[TokenCountExpr]].
  *
  * The built-in pair materializes every token into an array only to
  * read its length; the replacement is one byte-counting pass with no
  * allocation, and stays inside whole-stage codegen. Matched only for
  * the literal single-space pattern with the default limit (−1) and
  * modern null semantics (`legacySizeOfNull = false`), where the two
  * are value-identical including empty strings and trailing
  * separators. Injected via `SparkSessionExtensions
  * .injectOptimizerRule` ([[graft.GraftExtensions]]).
  */
object ReplaceTokenCount extends Rule[LogicalPlan] {
  private val Space = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(text, sep: Literal, lim: Literal), false)
          if Space == sep.value && lim.value == -1 =>
        TokenCountExpr(text)
    }
}
