package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The custom codegen DotProductExpr must be bit-identical to the
  * built-in higher-order formulation (that identity is what keeps the
  * DuckDB-oracle parity intact after the swap).
  */
class VectorFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("codegen dot == HOF dot, bit-exact, on the embeddings fixture") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val joined = emb.alias("l").join(emb.alias("r"),
      col("l.vec_id") + 1 === col("r.vec_id"))
    val diff = joined.select(
      dotD(col("l.embedding"), col("r.embedding")).as("a"),
      dotHof(col("l.embedding"), col("r.embedding")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("signBands == the composed per-plane when(dot>=0) form, bit-exact") {
    // the fused signature expression must agree with the formulation
    // the DuckDB oracle replicates (Σᵢ CASE WHEN planeᵢ·x >= 0) on the
    // real fixture — including zero vectors (dot 0 >= 0 sets the bit)
    val planes = graft.ops.Similarity.hyperplanes(56, 64, 42L)
    val composed = planes.zipWithIndex.map { case (p, i) =>
      when(dotD(col("embedding"), array(p.map(lit): _*)) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val diff = emb.select(signBands(col("embedding"), planes).as("a"),
        composed.as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // interpreted eval path (LocalRelation folds eagerly) agrees too
    val local = Seq(Tuple1(Array.fill(64)(0.25f))).toDF("embedding")
    val row = local.select(signBands(col("embedding"), planes).as("a"),
      composed.as("b")).head()
    assert(row.getLong(0) == row.getLong(1))
  }

  test("dot handles known values, null array, length mismatch") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f)))
    ).toDF("a", "b")
    val got = df.select(dotD(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 32.0)
    assert(got(1) == null)
    assert(got(2) == 3.0) // shorter-prefix semantics
  }

  test("graft_dot is registered for SQL via GraftExtensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(v == 11.0)
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((Array(0.1f, -0.2f, 0.7f), Array(0.1f, -0.2f, 0.7f)))
      .toDF("a", "b")
    assert(df.select(round(cosineD(col("a"), col("b")), 9)).head().getDouble(0) == 1.0)
  }

  test("graft_top_cells matches the composed array_sort(struct) ranking bit for bit") {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val rnd = new scala.util.Random(11)
    val centroids = Array.fill(23, 16)(rnd.nextGaussian())
    // duplicate centroid → equal scores exercise the lower-cell tie-break
    centroids(7) = centroids(3).clone()
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val composed = array_sort(array(centroids.toSeq.zipWithIndex.map {
      case (cArr, i) =>
        val dot = dotD(col("embedding"), array(cArr.toSeq.map(lit): _*))
        struct((lit(cArr.map(x => x * x).sum / 2) - dot).as("negscore"),
          lit(i).as("cell"))
    }: _*))
    val k = 4
    val rows = df.select(
      toCol(graft.functions.TopCellsExpr(centroids, k, toExpr(col("embedding"))))
        .as("fused"),
      transform(slice(composed, 1, k), p => p.getField("cell")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"fused ${r.getSeq[Int](0)} != composed ${r.getSeq[Int](1)}")
    }
    // k = 1 (the corpus-assignment shape) agrees too
    val one = df.select(
      toCol(graft.functions.TopCellsExpr(centroids, 1, toExpr(col("embedding"))))
        .getItem(0).as("fused"),
      composed.getItem(0).getField("cell").as("ref")).collect()
    one.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
