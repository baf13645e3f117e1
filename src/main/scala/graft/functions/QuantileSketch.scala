package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Re-aggregatable quantile sketches (DataSketches KLL), the quantile
  * twin of the HLL rollup (`agg_sketch_merge`): a rollup table stores
  * one serialized sketch per fine-grained cell, and coarser quantiles
  * come from MERGING sketches — never re-touching raw rows. KLL with
  * k=200 bounds the normalized rank error at ~1.65% (99% confidence);
  * the catalog contract (`agg_quantile_rollup`) checks a generous 5%
  * rank band so the probabilistic bound is de-facto deterministic.
  *
  * Implemented as [[TypedImperativeAggregate]] (the same execution
  * shape as Spark's own hll_sketch_agg): the buffer is the live
  * sketch OBJECT between rows — serialization happens only at
  * partial-agg shuffle boundaries, not per row.
  */
object QuantileSketch {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: raw doubles → serialized sketch (aggregate). */
  def kllAgg(c: Column, k: Int = 200): Column =
    GraftColumnBridge.column(
      KllAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: serialized sketches → merged sketch (aggregate). */
  def kllMerge(c: Column, k: Int = 200): Column =
    GraftColumnBridge.column(
      KllMergeAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: sketch → quantile at `rank`. */
  def kllQuantile(c: Column, rank: Double): Column =
    GraftColumnBridge.column(
      KllQuantileExpr(GraftColumnBridge.expression(c), rank))

  /** Column API: sketch → array of quantiles, ONE deserialization for
    * all ranks (use this when reading several quantiles per sketch). */
  def kllQuantiles(c: Column, ranks: Seq[Double]): Column =
    GraftColumnBridge.column(
      KllQuantilesExpr(GraftColumnBridge.expression(c), ranks))

  /** Shared shape of both sketch aggregates: everything but what a
    * row contributes (`update`). */
  sealed abstract class KllAggBase
      extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {
    def k: Int
    def inputType: DataType

    final override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)
    final override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }
    final override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    final override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    final override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    final override def dataType: DataType = BinaryType
    final override def nullable: Boolean = false
    final override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == inputType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects $inputType input, got ${child.dataType}")
  }

  /** raw doubles → serialized KLL sketch. */
  case class KllAgg(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KllAggBase {

    override def inputType: DataType = DoubleType

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_agg"
  }

  /** serialized sketches → merged serialized sketch (the rollup step). */
  case class KllMergeAgg(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KllAggBase {

    override def inputType: DataType = BinaryType

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_merge"
  }

  /** serialized sketch → quantile estimate at `rank` (inclusive
    * criteria); null for the empty sketch. */
  case class KllQuantileExpr(child: Expression, rank: Double)
      extends UnaryExpression with CodegenFallback {
    require(rank >= 0.0 && rank <= 1.0, "rank must be in [0, 1]")

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary sketch, got ${child.dataType}")

    override def nullSafeEval(bytes: Any): Any = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
    }

    override protected def withNewChildInternal(newChild: Expression): KllQuantileExpr =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_quantile"
  }

  /** serialized sketch → array of quantile estimates: the sketch is
    * deserialized ONCE per row for all ranks (vs once per rank with
    * repeated [[KllQuantileExpr]] calls — the difference scales as
    * rows × ranks over a big rollup table). Null for the empty
    * sketch. */
  case class KllQuantilesExpr(child: Expression, ranks: Seq[Double])
      extends UnaryExpression with CodegenFallback {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
      "ranks must be non-empty, each in [0, 1]")
    private val rankArr = ranks.toArray

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary sketch, got ${child.dataType}")

    override def nullSafeEval(bytes: Any): Any = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else new GenericArrayData(
        sk.getQuantiles(rankArr, QuantileSearchCriteria.INCLUSIVE))
    }

    override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_quantiles"
  }
}
