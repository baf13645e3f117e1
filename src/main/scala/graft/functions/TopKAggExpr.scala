package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: per group, the k largest
  * `(value, id)` pairs ordered (value DESC, id ASC), evaluated as a
  * [[TypedImperativeAggregate]] so the buffer is two primitive
  * k-arrays mutated in place — no per-row object allocation, no
  * typed-Dataset serialization boundary ([[graft.ops.TopK.TopKAgg]],
  * the `Aggregator` form, plans an `AppendColumns` that deserializes
  * every input row out of Tungsten; this expression reads its inputs
  * straight off the aggregate's input row and keeps the producing
  * stage inside whole-stage codegen). Same execution shape as Spark's
  * own collect_top_k / hll_sketch_agg.
  *
  * Null value or id contributes nothing (it cannot rank). NaN values
  * are likewise skipped: NaN has no place in a total order — callers
  * ranking a possibly-NaN metric must normalize first (the similarity
  * operators exclude zero-norm vectors for exactly this reason).
  *
  * Output: `array<struct<v: double, id: bigint>>`, sorted, ≤ k rows.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Buf] with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")
  import TopKPairsAgg.Buf

  override def prettyName: String = "graft_top_k_pairs"

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = left.eval(input)
    if (v != null) {
      val id = right.eval(input)
      if (id != null) buf.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.mergeIn(b2); b1 }

  override def eval(buf: Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < rows.length) { rows(i) = InternalRow(buf.vs(i), buf.ids(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf(k)
    buf.reserve(n)
    buf.n = n
    var i = 0
    while (i < n) { buf.vs(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, bigint) inputs, got ($l, $r)")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {

  /** Mutable bounded buffer: parallel arrays sorted (v DESC, id ASC),
    * binary-search insert + arraycopy shift — ~k writes worst case,
    * O(log k) compares, zero allocation per row.
    *
    * Arrays start at min(k, 16) and DOUBLE toward k as entries land:
    * an eager k-sized allocation per group costs 16·k bytes the moment
    * a group exists, and a hash-aggregation map holds every group's
    * buffer live — at k in the thousands (the similarity rerank tier)
    * that multiplied into heap exhaustion before any group was even
    * full. Growth stays amortized O(1) per insert. Peak state is
    * still groups-per-task × 16·k once groups FILL — callers with
    * large k bound their group count per task (the rerank paths chunk
    * their query sets — see Similarity.chunkQueries).
    */
  final class Buf(val k: Int) {
    var n: Int = 0
    var vs: Array[Double] = new Array[Double](math.min(k, 16))
    var ids: Array[Long] = new Array[Long](math.min(k, 16))

    def reserve(cap: Int): Unit = if (cap > vs.length) {
      val next = math.min(k, math.max(cap, vs.length * 2))
      vs = java.util.Arrays.copyOf(vs, next)
      ids = java.util.Arrays.copyOf(ids, next)
    }

    @inline private def outranks(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
      v1 > v2 || (v1 == v2 && id1 < id2)

    def insert(v: Double, id: Long): Unit = {
      if (v != v) return // NaN: unrankable, skip (see scaladoc)
      if (n == k && !outranks(v, id, vs(k - 1), ids(k - 1))) return
      if (n < k) reserve(n + 1)
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (outranks(v, id, vs(mid), ids(mid))) hi = mid else lo = mid + 1
      }
      val last = if (n < k) n else k - 1
      System.arraycopy(vs, lo, vs, lo + 1, last - lo)
      System.arraycopy(ids, lo, ids, lo + 1, last - lo)
      vs(lo) = v
      ids(lo) = id
      if (n < k) n += 1
    }

    def mergeIn(o: Buf): Unit = {
      var i = 0
      while (i < o.n) { insert(o.vs(i), o.ids(i)); i += 1 }
    }
  }
}
