package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two `array<float>` (or
  * `array<double>`) columns.
  *
  * Semantics are IDENTICAL to the higher-order-function formulation
  * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0.0, +)` —
  * per-element double products accumulated left-to-right — so swapping
  * it in preserves bit-exact DuckDB-oracle parity. The difference is
  * execution: the HOF path allocates an intermediate array and
  * interprets two lambdas per row, while this compiles to a tight
  * primitive loop inside whole-stage codegen (~10× on the embedding
  * pair queries; the only custom Catalyst code the engine needs,
  * SURVEY.md §4.4).
  *
  * Nulls: null array → null result (BinaryExpression's null-safe
  * contract). Null *elements* contribute 0 on BOTH execution paths
  * (codegen emits the per-element guard only when the schema's
  * containsNull requires it); length mismatch uses the shorter prefix.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> on both sides, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s +=
          (if (xf) x.getFloat(i).toDouble else x.getDouble(i)) *
          (if (yf) y.getFloat(i).toDouble else y.getDouble(i))
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(e: Expression) =
        if (elemType(e) == FloatType) "getFloat" else "getDouble"
      def mayHaveNulls(e: Expression) =
        e.dataType.asInstanceOf[ArrayType].containsNull
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // null elements skip the pair, SAME as the interpreted eval —
      // without the guard the two execution modes diverge (zeroed
      // unsafe slot vs skipped term) or NPE on generic arrays. The
      // check is emitted only when the schema admits nulls, so
      // containsNull=false inputs keep the branch-free loop.
      val guard =
        if (mayHaveNulls(left) || mayHaveNulls(right))
          s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) "
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard$s += (double) $a.${get(left)}($i) * (double) $b.${get(right)}($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
