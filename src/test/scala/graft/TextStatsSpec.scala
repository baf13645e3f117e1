package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextStats

class TextStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def doc(t: String) = Seq((1L, t)).toDF("doc_id", "text")

  test("tokenStats exact values") {
    val r = TextStats.tokenStats(doc("the cat sat on the mat")).head()
    assert(r.getAs[Long]("len_chars") == 22)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct") == 5)
    assert(r.getAs[Long]("token_chars") == 17)
  }

  test("fingerprint matches the formula, deterministic") {
    val toks = "the cat sat".split(" ")
    val expected = toks.foldLeft(0L)((a, t) =>
      (a * 31 + (t.length.toLong * 256 + t.head.toInt)) % 1000000007L)
    val got = doc("the cat sat")
      .select(TextStats.fingerprint(org.apache.spark.sql.functions.col("text")))
      .head().getLong(0)
    assert(got == expected)
  }

  test("quality: stopword ratio and ttr") {
    val r = TextStats.qualityScore(doc("the the the cat")).head()
    assert(r.getAs[Double]("stop_ratio") == 0.75)
    assert(r.getAs[Double]("ttr") == 0.5)
    assert(!r.getAs[Boolean]("passes_quality")) // < 20 tokens
  }

  test("chunkOverlap: stride starts, size cap, short-doc single chunk, overlap width") {
    // 10 tokens, size=4 stride=3 → starts 0,3,6,9; last chunk truncated
    val ten = doc((1 to 10).map(i => s"t$i").mkString(" "))
    val chunks = TextStats.chunkOverlap(ten, size = 4, stride = 3)
      .collect().map(r => (r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_len"))).sortBy(_._1)
    assert(chunks.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    // consecutive chunks share size - stride = 1 token
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 + a._3 - b._2 == 1L); case _ => }
    // a doc shorter than one chunk yields exactly one truncated chunk
    val short = TextStats.chunkOverlap(doc("a b"), size = 128, stride = 96).collect()
    assert(short.length == 1 &&
      short.head.getAs[Long]("tok_start") == 0L &&
      short.head.getAs[Long]("tok_len") == 2L)
  }

  test("lmQualityTiers: fluent text outranks gibberish; tiers balanced; short docs tail") {
    // docs 1-4 repeat the same fluent phrasing (high in-corpus bigram
    // likelihood); docs 5-8 are unique gibberish (every bigram count 1,
    // smoothed probability ~1/V); doc 9 is a single token (no bigrams)
    val docs = (1L to 4L).map(i => (i, "the cat sat on the mat " * 3)) ++
      (5L to 8L).map(i => (i, s"zz$i qq$i ww$i rr$i kk$i jj$i")) ++
      Seq((9L, "lonely"))
    val out = TextStats.lmQualityTiers(docs.toDF("doc_id", "text"), tiers = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("like_micro"),
          r.getAs[Long]("tier"))).toMap
    assert(out.size == 9, "every doc surfaces")
    assert(out(9L)._1 == 0L && out(9L)._2 == 0L)
    // every fluent doc scores a strictly higher mean likelihood than
    // every gibberish doc, so no fluent doc lands in a worse tier
    def avg(t: (Long, Long, Long)) = t._2.toDouble / math.max(t._1, 1L)
    assert((1L to 4L).map(d => avg(out(d))).min >
      (5L to 8L).map(d => avg(out(d))).max)
    assert((1L to 4L).map(out(_)._3).max <= (5L to 8L).map(out(_)._3).min,
      s"fluent tiers ${(1L to 4L).map(out(_)._3)} vs gibberish ${(5L to 8L).map(out(_)._3)}")
    assert(out(9L)._3 == 3L)
    // ntile(3) over 9 rows: exactly 3 docs per tier
    assert(out.values.groupBy(_._3).view.mapValues(_.size).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 3))
    // per-bigram micro-unit score: each gibberish bigram is unseen-once
    // (c12=1, c1=1) → floor(1e9 * 2 / (1 + V)); V = distinct tokens
    val v = docs.flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct.size
    val perBigram = math.floor(1e9 * 2 / (1.0 + v)).toLong
    assert(out(5L)._2 == 5L * perBigram, s"v=$v got=${out(5L)}")
    // the tiering is Ranks.totalOrderRankSuite, so past the size
    // switch the global ntile becomes the two-level bucketed form —
    // pin path parity here by forcing buckets on the same input
    val twoLevel = TextStats
      .lmQualityTiers(docs.toDF("doc_id", "text"), tiers = 3,
        rankBuckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("like_micro"),
          r.getAs[Long]("tier"))).toMap
    assert(twoLevel == out, "two-level tiering diverged from plain ntile")
  }

  test("langId picks the language with most marker hits; ties go to max code") {
    val rows = TextStats.langId(Seq(
      (1L, "el la de y la el"),       // es markers
      (2L, "der die und das die"),    // de markers
      (3L, "zzz qqq www")             // no markers anywhere → tie of zeros
    ).toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(rows(1L) == "es")
    assert(rows(2L) == "de")
    assert(rows(3L) == "zh") // all scores 0 → lexicographically max code
  }
}
