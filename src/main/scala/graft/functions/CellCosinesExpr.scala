package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine similarity between an embedding and its `k` nearest
  * coarse-quantizer cells, ranked by the SAME assignment rule as
  * [[TopCellsExpr]] (argmin-k over `‖c‖²/2 − x·c`, ties to the lower
  * cell id) — so element `i` here scores the cell that
  * `TopCellsExpr(k)` puts at position `i`.
  *
  * Exists for the adaptive probe escalation
  * (`Similarity.ivfPqIndexedTopKAdaptive`): after a narrow first
  * pass, the cosine to the first NOT-YET-PROBED centroid (element
  * `nprobe₀` of this array, 0-based) is the natural "could an
  * unprobed cell still beat my current kth neighbor" signal, and
  * computing it inside the same fused centroid loop costs one extra
  * double per kept cell instead of a second expression tree over
  * nlist centroids.
  *
  * Same input contract as [[TopCellsExpr]]: null elements contribute
  * 0 to the dot product, a null array is null. A zero-norm embedding
  * (cosine undefined) emits −1 for every cell — the "never a reason
  * to escalate" value, matching the probe paths that drop zero-norm
  * queries outright. Shorter-than-k results (k > nlist) return one
  * element per cell.
  */
case class CellCosinesExpr(centroids: Array[Array[Double]], k: Int,
                           child: Expression)
    extends UnaryExpression {

  require(k >= 1 && k <= centroids.length,
    s"graft_cell_cosines: k=$k outside 1..${centroids.length}")

  override def prettyName: String = "graft_cell_cosines"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $other")
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2)

  @transient private lazy val cellNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Exposed for codegen. Identical ranking loop to
    * [[TopCellsExpr.topk]], additionally carrying each kept cell's
    * dot product so the cosines come out of the one pass.
    */
  def cosines(emb: ArrayData): ArrayData = {
    val n = emb.numElements()
    val bestCell = new Array[Int](k)
    val bestScore = new Array[Double](k)
    val bestDot = new Array[Double](k)
    var filled = 0
    var qSq = 0.0
    var qi = 0
    while (qi < n) {
      if (!emb.isNullAt(qi)) {
        val v = if (isFloat) emb.getFloat(qi).toDouble else emb.getDouble(qi)
        qSq += v * v
      }
      qi += 1
    }
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
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(score, bestScore(pos - 1)) < 0)
        pos -= 1
      if (pos < k) {
        val upto = math.min(filled, k - 1)
        var j = upto
        while (j > pos) {
          bestCell(j) = bestCell(j - 1); bestScore(j) = bestScore(j - 1)
          bestDot(j) = bestDot(j - 1); j -= 1
        }
        bestCell(pos) = cell
        bestScore(pos) = score
        bestDot(pos) = dot
        if (filled < k) filled += 1
      }
      cell += 1
    }
    val qNorm = math.sqrt(qSq)
    val out = new Array[Double](filled)
    var o = 0
    while (o < filled) {
      val denom = qNorm * cellNorms(bestCell(o))
      out(o) = if (denom > 0) bestDot(o) / denom else -1.0
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    cosines(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellCosinesExpr", this,
      classOf[CellCosinesExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.cosines($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
