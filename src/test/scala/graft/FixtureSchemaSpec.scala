package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard (VERDICT r4 ask #3): the round-4 regression was a
  * silent fixture regeneration — `events.ts` moved from parquet
  * TIMESTAMP(NANOS) (read as BIGINT under `nanosAsLong`) to
  * `timestamp[us]` (read natively as TIMESTAMP_NTZ), and 30 catalog
  * queries died at analysis. This suite fails ONE NAMED TEST instead
  * when the fixtures drift, and pins BOTH vintages of the adaptive
  * events loader so neither can break the catalog again.
  */
class FixtureSchemaSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("events loader normalizes ts to epoch-nanos long for BOTH fixture vintages") {
    // vintage A: whatever the current fixture carries (us-timestamp today)
    val cur = Tables.eventsRaw(spark, dir)
    assert(cur.schema("ts").dataType == LongType,
      s"eventsRaw must surface ts as epoch-nanos LongType, got ${cur.schema("ts").dataType}")

    // vintage B: legacy epoch-nanos BIGINT — synthesize a fixture dir
    val tmp = java.nio.file.Files.createTempDirectory("graft-fixture-vintage").toString
    val legacy = spark.range(3).select(
      col("id").as("event_id"),
      (lit(1705276800000000000L) + col("id") * 1000000000L).as("ts"),
      lit(7L).as("user_id"), lit("click").as("event_type"),
      lit(1.5).as("value"), lit("{}").as("props"))
    legacy.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val back = Tables.eventsRaw(spark, tmp)
    assert(back.schema("ts").dataType == LongType)
    // and both vintages yield IDENTICAL derived event time
    val ms = Tables.events(spark, tmp).select("ts_ms").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(ms.head == 1705276800000L && ms.length == 3)

    // the BOUNDED loader (the pushdown-eligible watermark scan) agrees
    // with post-filtering on BOTH vintages too — a vintage flip must
    // not silently change which rows a time bound admits
    val bound = 1705276800000L * 1000000L + 1500000000L // mid second row
    for (d <- Seq(dir, tmp)) {
      val got = Tables.eventsRawSince(spark, d, bound).count()
      val want = Tables.eventsRaw(spark, d).filter(col("ts") >= bound).count()
      assert(got == want, s"eventsRawSince drifted from post-filter in $d")
    }
  }

  test("events derived columns analyze and agree: ts_ms, event_ts, day bucket") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts_ms").dataType == LongType)
    assert(e.schema("event_ts").dataType == TimestampType)
    // exact integer agreement between the nanos long and the timestamp
    val bad = e.filter(unix_millis(col("event_ts")) =!= col("ts_ms")).count()
    assert(bad == 0L, s"$bad rows where event_ts disagrees with ts_ms")
  }

  test("fixture read-schemas match the engine's assumed contracts") {
    def types(name: String): Map[String, DataType] =
      Tables.table(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

    def isTimeLike(t: DataType): Boolean =
      t == LongType || t.isInstanceOf[TimestampType] || t == TimestampNTZType
    def isDateLike(t: DataType): Boolean =
      t == DateType || t.isInstanceOf[TimestampType] || t == TimestampNTZType

    val ev = types("events")
    assert(Set("event_id", "ts", "user_id", "event_type", "value", "props")
      .subsetOf(ev.keySet), s"events columns drifted: ${ev.keySet}")
    // ts must be one of the two vintages the adaptive loader handles
    assert(isTimeLike(ev("ts")), s"unhandled events.ts dtype ${ev("ts")}")
    assert(ev("value") == DoubleType && ev("props") == StringType)

    val li = types("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType
      && isDateLike(li("l_shipdate")), s"lineitem contract drifted: $li")
    val or = types("orders")
    assert(or("o_orderkey") == LongType && isDateLike(or("o_orderdate")))

    val doc = types("documents")
    assert(doc("doc_id") == LongType && doc("text") == StringType,
      s"documents contract drifted: $doc")
    val em = types("embeddings")
    assert(em("vec_id") == LongType &&
      (em("embedding") == ArrayType(FloatType, containsNull = true) ||
       em("embedding") == ArrayType(FloatType, containsNull = false)),
      s"embeddings contract drifted: $em")
  }
}
