package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `k` nearest coarse-quantizer cells of an embedding, as one
  * fused expression: argmin-k over `‖c‖²/2 − x·c` (equivalent to
  * argmin ‖x−c‖², the IVF assignment rule), ties broken on the lower
  * cell id.
  *
  * Replaces the composed spelling
  * `array_sort(array(struct(negscore₀,0), …, struct(negscoreₙ,n)))`:
  * that form materializes and sorts `nlist` structs PER ROW, which
  * dominates corpus-side cell assignment once nlist is
  * production-sized (`Dedup.semParams`: 400 cells at 100k vectors —
  * the composed form measured ~120 s for a 100k-row assignment pass
  * at sf5 where the dot products alone cost seconds). Here the
  * centroid dot products run in one tight loop and a bounded
  * insertion (k ≤ nprobe, single-digit) keeps the running top-k —
  * no per-row allocation beyond the k-element result.
  *
  * Ordering is BIT-IDENTICAL to the composed form: scores are
  * `halfNorm − dot` with `dot` accumulated left-to-right in double
  * (the [[DotProductExpr]] rule), `halfNorm` precomputed the same way
  * the literal was, comparisons via `Double.compare` (NaN sorts
  * last, as in Spark's struct ordering), and an equal-score later
  * cell never displaces an earlier one — so every recall measurement
  * pinned against the composed form carries over unchanged.
  *
  * Null elements contribute 0 to the dot product (same guard as
  * [[DotProductExpr]]); a null array is null (UnaryExpression's
  * null-safe contract).
  */
case class TopCellsExpr(centroids: Array[Array[Double]], k: Int,
                        child: Expression)
    extends UnaryExpression {

  require(k >= 1 && k <= centroids.length,
    s"graft_top_cells: k=$k outside 1..${centroids.length}")

  override def prettyName: String = "graft_top_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $other")
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ‖c‖²/2 per cell, summed left-to-right exactly like the literal
    * `cArr.map(x => x*x).sum / 2` the composed form embedded. */
  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2)

  /** Exposed for codegen (the generated code calls straight in; the
    * loop body is identical to the interpreted path). */
  def topk(emb: ArrayData): ArrayData = {
    val n = emb.numElements()
    val bestCell = new Array[Int](k)
    val bestScore = new Array[Double](k)
    var filled = 0
    var cell = 0
    while (cell < centroids.length) {
      val c = centroids(cell)
      val m = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        if (!emb.isNullAt(i))
          dot += (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * c(i)
        i += 1
      }
      val score = halfNorms(cell) - dot
      // bounded insertion: find the slot this cell belongs in (strictly
      // better than the incumbent — an equal score keeps the earlier,
      // lower, cell id, matching lexicographic (score, cell) order)
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(score, bestScore(pos - 1)) < 0)
        pos -= 1
      if (pos < k) {
        val upto = math.min(filled, k - 1)
        var j = upto
        while (j > pos) {
          bestCell(j) = bestCell(j - 1); bestScore(j) = bestScore(j - 1); j -= 1
        }
        bestCell(pos) = cell
        bestScore(pos) = score
        if (filled < k) filled += 1
      }
      cell += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestCell, filled))
  }

  override protected def nullSafeEval(input: Any): Any =
    topk(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCellsExpr", this, classOf[TopCellsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.topk($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
