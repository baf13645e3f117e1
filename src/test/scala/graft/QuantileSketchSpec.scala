package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QuantileSketch._

/** The KLL rollup contract: building one sketch per cell and MERGING
  * beats re-scanning raw rows only if the merged estimate still honors
  * the rank bound — that is what these tests check, against exact
  * ranks computed from the same data.
  */
class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("merged per-cell sketches give quantiles within the rank bound") {
    val n = 40000
    // deterministic scatter over 8 cells, values 0..n-1 permuted
    val df = spark.range(n)
      .select((col("id") % 8).as("cell"),
        ((col("id") * 2654435761L) % n).cast("double").as("v"))
      .repartition(8)
    val perCell = df.groupBy("cell").agg(kllAgg(col("v")).as("sk"))
    val est = perCell.agg(kllMerge(col("sk")).as("m"))
      .select(kllQuantile(col("m"), 0.5).as("p50"),
        kllQuantile(col("m"), 0.9).as("p90"))
      .head()
    // true rank of the estimate, computed exactly (values are a
    // permutation of 0..n-1, so rank(x) = (x+1)/n for integral x)
    def rank(x: Double): Double = (x + 1) / n
    assert(math.abs(rank(est.getDouble(0)) - 0.5) <= 0.05)
    assert(math.abs(rank(est.getDouble(1)) - 0.9) <= 0.05)
  }

  test("SQL surface: graft_kll_agg / merge / quantile through the extensions") {
    spark.range(10000).select((col("id") % 4).as("cell"),
        col("id").cast("double").as("v"))
      .createOrReplaceTempView("kll_in")
    val p50 = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(sk), 0.5) AS p50
        |FROM (SELECT cell, graft_kll_agg(v) AS sk FROM kll_in GROUP BY cell)
        |""".stripMargin).head().getDouble(0)
    assert(math.abs(p50 / 10000.0 - 0.5) <= 0.05)
  }

  test("wrong input types fail at analysis, not with executor ClassCastExceptions") {
    spark.range(10).createOrReplaceTempView("kll_types")
    // BIGINT into the double agg
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_kll_agg(id) FROM kll_types").collect())
    assert(e1.getMessage.contains("DoubleType") || e1.getMessage.contains("expects"))
    // string into the quantile extractor
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_kll_quantile(CAST('x' AS STRING), 0.5)").collect())
    assert(e2.getMessage.contains("binary") || e2.getMessage.contains("expects"))
  }

  test("multi-rank extraction matches per-rank; SQL accepts the k parameter") {
    val sk = spark.range(1000).select(col("id").cast("double").as("v"))
      .agg(kllAgg(col("v")).as("sk"))
    val row = sk.select(
      kllQuantiles(col("sk"), Seq(0.25, 0.75)).as("qs"),
      kllQuantile(col("sk"), 0.25).as("q25"),
      kllQuantile(col("sk"), 0.75).as("q75")).head()
    val qs = row.getAs[scala.collection.Seq[Double]]("qs")
    assert(qs(0) == row.getAs[Double]("q25") && qs(1) == row.getAs[Double]("q75"))

    spark.range(1000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("kll_kparam")
    val p = spark.sql(
      "SELECT graft_kll_quantile(graft_kll_agg(v, 400), 0.5) FROM kll_kparam")
      .head().getDouble(0)
    assert(math.abs(p / 1000.0 - 0.5) <= 0.05)
  }

  test("merge of disjoint ranges spans both; empty sketch quantile is null") {
    val lo = spark.range(0, 1000).select(col("id").cast("double").as("v"))
      .agg(kllAgg(col("v")).as("sk"))
    val hi = spark.range(9000, 10000).select(col("id").cast("double").as("v"))
      .agg(kllAgg(col("v")).as("sk"))
    val m = lo.union(hi).agg(kllMerge(col("sk")).as("m"))
      .select(kllQuantile(col("m"), 0.0).as("mn"),
        kllQuantile(col("m"), 1.0).as("mx")).head()
    assert(m.getDouble(0) == 0.0 && m.getDouble(1) == 9999.0)

    val empty = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(kllAgg(col("v")).as("sk"))
      .select(kllQuantile(col("sk"), 0.5)).head()
    assert(empty.isNullAt(0))
  }
}
