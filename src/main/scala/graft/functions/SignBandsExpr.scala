package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane sign signature of an `array<float|double>`
  * embedding as one BIGINT: bit i is set iff `planes(i) · x >= 0`.
  *
  * Semantically identical to the composed form
  * `Σᵢ when(dotD(x, lit(planes(i))) >= 0, 1L << i)` — each plane dot
  * is a left-to-right double accumulation, so the DuckDB oracle's
  * `CASE WHEN list_reduce(...) >= 0` replication stays bit-exact. The
  * difference is execution: the composed form evaluates nBits
  * separate expressions per row, each walking a BOXED constant array
  * (constant folding produces GenericArrayData of java.lang.Double),
  * measured ~90k plane-dots/s/core — the signature pass dominated the
  * whole near-dup pipeline. Here the planes live as one primitive
  * `double[][]` reference object and the row is signed in a single
  * fused loop nest inside whole-stage codegen (~100× on the
  * signature stage).
  *
  * Nulls: null array → null. Null ELEMENTS contribute 0 to every
  * plane dot, matching [[DotProductExpr]]'s convention. Rows shorter
  * than a plane use the shorter prefix.
  */
case class SignBandsExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def prettyName: String = "graft_sign_bands"
  override def dataType: DataType = LongType

  require(planes.nonEmpty && planes.length <= 62,
    s"signature must fit a BIGINT: ${planes.length} planes")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val xf = isFloat
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(x.numElements(), p.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (!x.isNullAt(j))
          acc += p(j) * (if (xf) x.getFloat(j).toDouble else x.getDouble(j))
        j += 1
      }
      if (acc >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val ps = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val guard =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if (!$x.isNullAt($j)) "
        else ""
      s"""
         |long $sig = 0L;
         |for (int $i = 0; $i < $ps.length; $i++) {
         |  double[] $p = $ps[$i];
         |  int $n = java.lang.Math.min($x.numElements(), $p.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $guard$acc += $p[$j] * (double) $x.$get($j);
         |  }
         |  if ($acc >= 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
