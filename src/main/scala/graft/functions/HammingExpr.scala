package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen Hamming distance over two packed sign-code columns
  * (`array<bigint>`, each element one 62-bit word from
  * [[SignBandsExpr]]).
  *
  * Semantics match the higher-order-function formulation
  * `aggregate(zip_with(a,b,(x,y)->bit_count(x^y)), 0, +)` — per-word
  * xor popcounts summed left-to-right — for EQUAL-LENGTH inputs,
  * which is every caller here (both sides pack the same nBits into
  * the same word count). On MISMATCHED lengths the two diverge:
  * `zip_with` null-pads the shorter array so the HOF sum comes back
  * NULL, while this expression sums the shared prefix and ignores
  * the tail — a deliberate simplification, not an equivalence (a
  * length mismatch means the codes came from different signing
  * configs and any distance is noise; neither answer is "right").
  * For the equal-length case the swap changes nothing the oracle can
  * see. The difference that matters
  * is execution: the HOF path allocates an intermediate array and
  * interprets two lambdas per CANDIDATE PAIR, which put the binary
  * scan tier two orders of magnitude off its own design point
  * (measured 289 s for the sf1 catalog configuration where the PQ
  * ADC scan of identical shape runs seconds); this compiles to
  * `words` xor+Long.bitCount ops inside whole-stage codegen — the
  * one-cycle-per-word scan [[graft.ops.Similarity.binaryTopK]]'s
  * contract describes.
  *
  * Nulls: null array → null result (BinaryExpression's null-safe
  * contract). Null *elements* contribute 0 on both execution paths
  * (guard emitted only when the schema admits element nulls); length
  * mismatch uses the shorter prefix (diverging from zip_with's
  * null-pad — see above).
  */
case class HammingExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> on both sides, got ($l, $r)")
    }

  private def mayHaveNulls(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val guard =
        if (mayHaveNulls(left) || mayHaveNulls(right))
          s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) "
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard$s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
