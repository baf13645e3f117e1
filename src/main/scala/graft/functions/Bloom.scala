package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership test for prefilter joins.
  *
  * The decontamination / semi-join pattern broadcasts the held-out key
  * SET (`ext_decontaminate`). That stops working when the benchmark
  * side outgrows the broadcast threshold — but its BLOOM FILTER still
  * broadcasts long after the exact set cannot: ~1.2 bytes/key at 1%
  * FP (vs ≥ 50 bytes/key for a hashed string set), so a 1B-shingle
  * held-out set is a ~1.2 GB bitset instead of an un-broadcastable
  * 50 GB hash set. The bloom prunes ~99% of corpus-side rows BEFORE
  * they reach the exact verify join, shrinking its shuffle to the
  * candidate survivors; false positives are removed by that exact
  * join, so results are bit-identical to the unfiltered plan.
  *
  * Spark uses the same shape internally for runtime row-group
  * filtering (InjectRuntimeFilter); this exposes it as a first-class
  * operator on `org.apache.spark.util.sketch.BloomFilter` (public
  * API, order-independent OR-merge ⇒ deterministic bitset).
  */
object Bloom {

  /** Distributed build over a LongType column (treeAggregate under
    * `stat.bloomFilter`), serialized to a broadcastable blob.
    */
  def build(df: org.apache.spark.sql.DataFrame, col: String,
            expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val filter = df.stat.bloomFilter(col, math.max(expectedItems, 1L), fpp)
    val out = new ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  /** `mightContain(blob, hash)` as a codegen'd Column predicate. */
  def mightContain(blob: Array[Byte], hash: Column): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(blob, GraftColumnBridge.expression(hash)))
}

/** Membership probe against a serialized [[BloomFilter]]. The blob
  * rides the serialized expression to executors (one copy per task
  * set, not per row); the filter deserializes once per executor via
  * the transient lazy and the generated code calls straight into
  * `mightContainLong` — the probe stays inside whole-stage codegen.
  */
final case class BloomMightContainExpr(blob: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom probe needs a LongType hash, got ${child.dataType}")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(blob))

  /** Exposed for codegen: the generated code probes via this method so
    * the lazy deserialization is shared with interpreted eval.
    */
  def probe(hash: Long): Boolean = filter.mightContainLong(hash)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
