package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{EditDistance, EditDistanceKernel}

/** Parity of the bit-parallel Myers kernel with the built-in
  * thresholded levenshtein — kernel-level (randomized, adversarial
  * shapes) and plan-level (whole-stage codegen path).
  */
class EditDistanceSpec extends AnyFunSuite with SparkTestBase {

  private def builtin(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  private def ours(a: String, b: String, k: Int): Int =
    EditDistanceKernel.levWithin(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("kernel matches built-in on randomized ASCII pairs, all k") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 3000) {
      val a = word(rnd.nextInt(20))
      // half the time mutate a (close pairs — the interesting region)
      val b = if (rnd.nextBoolean()) word(rnd.nextInt(20))
        else a.toVector.flatMap(c =>
          if (rnd.nextInt(8) == 0) rnd.nextInt(3) match {
            case 0 => Vector() // delete
            case 1 => Vector(alpha(rnd.nextInt(alpha.length))) // substitute
            case _ => Vector(c, alpha(rnd.nextInt(alpha.length))) // insert
          } else Vector(c)).mkString
      for (k <- 0 to 5)
        assert(ours(a, b, k) === builtin(a, b, k), s"a=$a b=$b k=$k")
    }
  }

  test("kernel handles boundary shapes: empty, 64-char word, >64 fallback, unicode") {
    assert(ours("", "", 0) === 0)
    assert(ours("", "ab", 2) === 2)
    assert(ours("", "ab", 1) === -1)
    val w64 = "ab" * 32 // exactly 64: high-bit arithmetic edge
    assert(ours(w64, w64, 2) === 0)
    assert(ours(w64, w64.dropRight(1) + "x", 2) === 1)
    assert(ours(w64 + "zz", w64, 3) === builtin(w64 + "zz", w64, 3))
    val w100 = "xy" * 50 // > 64: built-in fallback path
    assert(ours(w100, w100.updated(3, 'q'), 2) === 1)
    // multi-byte chars: byte-length bound must NOT misfire (€ is 3 bytes)
    assert(ours("€", "x", 1) === 1)
    assert(ours("héllo", "hello", 2) === 1)
    assert(ours("ééé", "eee", 2) === -1)
  }

  test("plan-level: codegen output matches the built-in computed outside Spark") {
    // NOTE: comparing two columns in one plan would be vacuous — the
    // ReplaceLevenshtein rule rewrites levenshtein(l, r, 2) into this
    // very kernel. So the reference values come from the built-in
    // UTF8String implementation invoked driver-side on collected
    // pairs, which no optimizer can touch; the kernel side runs
    // through real whole-stage codegen.
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), length(col("p_name")).as("_len"))
    val pairs = p.alias("l").join(p.alias("r"),
      col("l.p_brand") === col("r.p_brand") && col("l._len") === col("r._len") &&
        col("l.p_partkey") < col("r.p_partkey"))
    val rows = pairs.select(
      col("l.p_name").as("a"), col("r.p_name").as("b"),
      EditDistance.levWithin(col("l.p_name"), col("r.p_name"), 2).as("got"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val expected = builtin(r.getString(0), r.getString(1), 2)
      assert(r.getInt(2) === expected, s"${r.getString(0)} vs ${r.getString(1)}")
    }
  }

  test("SQL surface: graft_lev_within registered") {
    import spark.implicits._
    Seq(("kitten", "sitting"), ("abc", "abc")).toDF("a", "b")
      .createOrReplaceTempView("lv_pairs")
    val got = spark.sql(
      "SELECT graft_lev_within(a, b, 3) AS d FROM lv_pairs ORDER BY d").as[Int].collect()
    assert(got.toSeq === Seq(0, 3))
  }
}
