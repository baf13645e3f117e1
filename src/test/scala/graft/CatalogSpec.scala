package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fast regression: every catalog query plans and executes on sf0.001,
  * and the flagship entry returns rows. (Value-level correctness is
  * the DuckDB-oracle gate — tools/check_oracle.py at sf0.01.)
  */
class CatalogSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has distinct name and oracle keys ⊆ query keys") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- SparkEntry.catalog)
    test(s"${q.name} executes on sf0.001") {
      val df = q.fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.write.mode("overwrite").format("noop").save()
    }
}
