package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CorpusPipeline

/** End-to-end pins for ops.CorpusPipeline: each stage's rejection is
  * exercised by a doc built to fail exactly that stage, and the whole
  * pipeline is checked against an independently computed expectation.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // 25 distinct tokens: n_tok=25 ≥ 20, ttr=1 > 0.3, top share 0.04 ≤ 0.08
  private val good = words("alpha", 25)
  private val good2 = words("beta", 25)
  // shares the 5-token run "bench0 .. bench4" with the held-out doc
  private val contaminated = words("gamma", 20) + " " + words("bench", 5)
  private val short5 = words("tiny", 5)
  // one token 5/25 times: ttr 21/25 ok, top share 0.2 > 0.08
  private val repetitive = (words("delta", 20) + " rep rep rep rep rep")
    .split(' ').drop(5).mkString(" ") // keep 20 tokens: 15 distinct + 5 rep
  private val benchDoc = words("bench", 30) // held-out source

  private def docs = Seq(
    (0L, good, "en", "src1"),
    (1L, good, "en", "src2"),          // exact dup of 0 — dedup drops it
    (2L, good2, "en", "src1"),
    (3L, contaminated, "en", "src3"),  // decontamination drops it
    (4L, short5, "en", "src1"),        // quality: too_short
    (5L, repetitive, "en", "src2"),    // quality: repetitive
    (6L, benchDoc, "en", "src0")       // held-out — never admitted
  ).toDF("doc_id", "text", "lang", "source")

  test("each stage rejects exactly its designed-to-fail doc") {
    val out = CorpusPipeline.prep(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out.keySet == Set(0L, 2L), s"admitted set wrong: ${out.keySet}")
    assert(out(0L)._2 == 25L)
    // split comes from the pinned multiplicative hash
    def split(id: Long) = if ((id * 2654435761L) % 100 < 90) "train" else "eval"
    assert(out(0L)._3 == split(0L) && out(2L)._3 == split(2L))
  }

  test("repetitive fixture doc really has 20 tokens and a 25% top share") {
    // guards the test's own construction: if the doc drifted, the
    // quality stage might reject it for the wrong reason
    val toks = repetitive.split(' ')
    assert(toks.length == 20)
    assert(toks.count(_ == "rep") == 5)
    assert(toks.distinct.length.toDouble / toks.length > 0.3)
  }

  test("pipeline == independently composed stage filters on a mixed corpus") {
    val rnd = new scala.util.Random(37)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc() = (0 until (10 + rnd.nextInt(40)))
      .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val rows = (0 until 300).map { i =>
      (i.toLong, if (i % 11 == 0) good else doc(), "en", s"src${i % 6}")
    }
    val df = rows.toDF("doc_id", "text", "lang", "source").repartition(5)
    val got = CorpusPipeline.prep(df).select("doc_id").as[Long].collect().toSet

    // naive recomposition in plain Scala
    def toks(t: String) = t.split(' ').toSeq
    val quality = rows.filter { case (_, t, _, _) =>
      val ts = toks(t)
      val top = ts.groupBy(identity).values.map(_.size).max
      ts.size >= 20 && ts.distinct.size.toDouble / ts.size > 0.3 &&
        top.toDouble / ts.size <= 0.08
    }
    val canon = quality.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val deduped = quality.filter(r => canon(r._1))
    def shingles(t: String) = toks(t).sliding(5).filter(_.size == 5)
      .map(_.mkString(" ")).toSet
    val bench = rows.filter(_._4 == "src0").flatMap(r => shingles(r._2)).toSet
    val expected = deduped
      .filter(_._4 != "src0")
      .filter(r => (shingles(r._2) & bench).isEmpty)
      .map(_._1).toSet
    assert(got == expected)
  }
}
