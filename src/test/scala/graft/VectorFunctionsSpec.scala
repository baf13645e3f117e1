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

  test("graft_cell_cosines ranks cells in exactly graft_top_cells' order") {
    // the adaptive-probe escalation signal depends on the two
    // expressions' duplicated argmin-k loops staying element-wise in
    // sync: element i of cell_cosines must score the cell top_cells
    // puts at position i (r9 ADVICE — the probe spec alone would not
    // catch a desync, since its result matches a fixed probe either
    // way). Covers ties (duplicated centroid) and the zero-norm row.
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val rnd = new scala.util.Random(17)
    val centroids = Array.fill(19, 12)(rnd.nextGaussian())
    centroids(9) = centroids(2).clone() // equal-score tie pair
    val embs = (0 until 200).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextGaussian().toFloat))) :+
      (200L, Array.fill(12)(0.0f)) // zero-norm: cosine undefined → −1
    val df = embs.toDF("vec_id", "embedding")
    val k = 5
    val rows = df.select(col("embedding"),
      toCol(graft.functions.TopCellsExpr(centroids, k, toExpr(col("embedding"))))
        .as("cells"),
      toCol(graft.functions.CellCosinesExpr(centroids, k, toExpr(col("embedding"))))
        .as("cos")).collect()
    def refCosine(e: Seq[Float], c: Array[Double]): Double = {
      val dot = e.zip(c).map { case (x, y) => x.toDouble * y }.sum
      val d = math.sqrt(e.map(x => x.toDouble * x).sum) *
        math.sqrt(c.map(x => x * x).sum)
      if (d > 0) dot / d else -1.0
    }
    rows.foreach { r =>
      val e = r.getSeq[Float](0)
      val cells = r.getSeq[Int](1)
      val cos = r.getSeq[Double](2)
      assert(cells.length == k && cos.length == k)
      cells.zip(cos).foreach { case (cell, c) =>
        val ref = refCosine(e, centroids(cell))
        assert(math.abs(c - ref) < 1e-12,
          s"cell $cell: cosine $c != independent $ref")
      }
      // the tie pair (cells 2 and 9 identical): if both ranked, they
      // must be adjacent and in id order — the tie-break both loops
      // claim to share
      val i2 = cells.indexOf(2); val i9 = cells.indexOf(9)
      if (i2 >= 0 && i9 >= 0) assert(i9 == i2 + 1,
        s"tied cells not adjacent in id order: $cells")
    }
    // zero-norm row: every cosine is −1, the never-escalate value
    val znRow = rows.find(_.getSeq[Float](0).forall(_ == 0.0f)).get
    assert(znRow.getSeq[Double](2).forall(_ == -1.0))
  }
}
