package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Z-order layout: interleave arithmetic pinned on known values, and
  * the actual pruning-power claim measured — a z-ordered rewrite must
  * shrink mean per-file min/max spans on BOTH dimensions vs the
  * natural layout (single-key sort wins its own key but abandons the
  * other; z-order balances).
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def z(a: Int, b: Int): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .head().getLong(0)

  test("Morton interleave: known values and monotone locality") {
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L)
    assert(z(0, 1) === 2L)
    assert(z(3, 1) === 7L)        // 0b0101 | 0b0010
    assert(z(0xFFFF, 0) === 0x55555555L)
    assert(z(0, 0xFFFF) === 0xAAAAAAAAL)
    // clamp: only the low 16 bits participate
    assert(z(0x1FFFF, 0) === 0x55555555L)
  }

  test("Morton code is a bijection: round-trips through de-interleave on a bulk sample") {
    def compact(z: Long): Int = { // inverse of spread16 (even bits)
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x.toInt
    }
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(2000)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(compact(z) === a && compact(z >> 1) === b, s"($a,$b) -> $z")
    }
    assert(got.map(_.getLong(2)).distinct.length === got.length)
  }

  test("z-ordered rewrite shrinks per-file spans on both key dimensions") {
    val dir = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val natural = Files.createTempDirectory("layout-nat").toString
    val zorder = Files.createTempDirectory("layout-z").toString
    li.repartition(8).write.mode("overwrite").parquet(natural)
    Layout.zorderWrite(li, col("l_partkey"), col("l_suppkey"), zorder, files = 8)

    val nPart = Layout.meanFileSpan(spark.read.parquet(natural), "l_partkey")
    val nSupp = Layout.meanFileSpan(spark.read.parquet(natural), "l_suppkey")
    val zPart = Layout.meanFileSpan(spark.read.parquet(zorder), "l_partkey")
    val zSupp = Layout.meanFileSpan(spark.read.parquet(zorder), "l_suppkey")
    info(f"natural: part $nPart%.0f supp $nSupp%.0f | zorder: part $zPart%.0f supp $zSupp%.0f")

    // random placement leaves every file spanning ~the full key range;
    // 8 z-range files fix the top interleaved bits (alternating
    // between the binned dimensions), so BOTH tighten — unlike a
    // single-key sort, which wins its own key and abandons the other
    assert(zPart < nPart * 0.75)
    assert(zSupp < nSupp * 0.5)
    assert(zPart / nPart + zSupp / nSupp < 1.25)
  }
}
