package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): an
  * embedding is split into `m` subvectors, each quantized to one of
  * `ksub` per-subspace centroids, so a 64-dim float32 vector (256 B)
  * compresses to m=8 CODE BYTES. At 100 TB that is the difference
  * between scanning 100 TB of floats and scanning ~3 TB of codes:
  * the similarity scan runs over codes via table lookups (ADC), and
  * only the few rerank candidates ever touch the raw vectors again.
  *
  * Both kernels live inside whole-stage codegen: the codebooks ride
  * along as one primitive `double[][][]` reference object and the
  * generated code calls straight into the fused-loop methods below
  * (same pattern as [[SignBandsExpr]] / [[BloomMightContainExpr]]).
  */
object Pq {
  /** codebooks(m)(ksub)(dsub): per-subspace centroid tables. */
  type Codebooks = Array[Array[Array[Double]]]
}

/** `array<float|double>` embedding → `binary` PQ code of length m:
  * byte j = argmin_r ||x_subj − codebooks(j)(r)||² (ties → lowest r,
  * deterministic). Null array → null; null ELEMENTS read as 0.0
  * (matching [[DotProductExpr]]'s convention); rows shorter than
  * m·dsub treat missing dims as 0.0.
  */
final case class PqEncodeExpr(child: Expression, codebooks: Pq.Codebooks)
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = BinaryType

  require(codebooks.nonEmpty && codebooks.forall(_.length == codebooks(0).length)
    && codebooks(0).length <= 256, "ksub must fit one byte")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got $t")
  }

  /** Exposed for codegen; shared with interpreted eval. */
  def encode(x: ArrayData): Array[Byte] = {
    val xf = isFloat
    val m = codebooks.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val table = codebooks(j)
      val dsub = table(0).length
      var best = 0
      var bestD = Double.MaxValue
      var r = 0
      while (r < table.length) {
        val c = table(r)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val idx = off + t
          val v =
            if (idx >= x.numElements() || x.isNullAt(idx)) 0.0
            else if (xf) x.getFloat(idx).toDouble else x.getDouble(idx)
          val diff = v - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = r }
        r += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    defineCodeGen(ctx, ev, x => s"$ref.encode($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) inner-product score of a PQ `code`
  * against a query embedding: Σⱼ (q_subj · codebooks(j)(code(j))).
  * The per-query lookup table (m × ksub subspace dots) is computed
  * ONCE per query per task and cached by `q_id`, so each corpus code
  * scores in m table lookups + adds instead of a dim-length float
  * walk — the PQ fast-scan. Cache size = |broadcast queries| × m·ksub
  * doubles (≈1 KiB/query), bounded by the broadcast.
  */
final case class PqAdcExpr(qId: Expression, qEmb: Expression, code: Expression,
                           codebooks: Pq.Codebooks)
    extends TernaryExpression {

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def first: Expression = qId
  override def second: Expression = qEmb
  override def third: Expression = code

  private def isFloat: Boolean =
    qEmb.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (qId.dataType, qEmb.dataType, code.dataType) match {
      case (LongType, ArrayType(FloatType | DoubleType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, array<float|double>, binary), got $t")
    }

  @transient private lazy val tables =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def buildTable(q: ArrayData): Array[Double] = {
    val qf = isFloat
    val m = codebooks.length
    val ksub = codebooks(0).length
    val table = new Array[Double](m * ksub)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var r = 0
      while (r < ksub) {
        val c = cb(r)
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          val idx = off + t
          val v =
            if (idx >= q.numElements() || q.isNullAt(idx)) 0.0
            else if (qf) q.getFloat(idx).toDouble else q.getDouble(idx)
          acc += v * c(t)
          t += 1
        }
        table(j * ksub + r) = acc
        r += 1
      }
      off += dsub
      j += 1
    }
    table
  }

  /** Exposed for codegen; shared with interpreted eval. */
  def adc(qid: Long, q: ArrayData, code: Array[Byte]): Double = {
    var table = tables.get(qid)
    if (table == null) {
      table = buildTable(q)
      tables.putIfAbsent(qid, table)
    }
    val ksub = codebooks(0).length
    var s = 0.0
    var j = 0
    val m = math.min(code.length, codebooks.length)
    while (j < m) {
      s += table(j * ksub + (code(j) & 0xff))
      j += 1
    }
    s
  }

  override protected def nullSafeEval(id: Any, q: Any, c: Any): Any =
    adc(id.asInstanceOf[Long], q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    defineCodeGen(ctx, ev, (id, q, c) => s"$ref.adc($id, $q, $c)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(qId = newFirst, qEmb = newSecond, code = newThird)
}
