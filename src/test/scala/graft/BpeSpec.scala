package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE merge learning + segmentation (ops.Bpe): learned merges match
  * a naive reference trainer, the classic subword-nmt example
  * segments as published, replace-chain semantics pin odd runs and
  * mid-symbol non-matches, determinism across runs.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- naive reference implementation (driver-side, obviously
  //      correct): same tie-break (count desc, then (a, b) lex) and
  //      the same left-to-right single-pass merge application ----
  private def refApply(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refLearn(words: Seq[String], nMerges: Int,
                       minCount: Long = 2L): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          merges += ((a, b))
          vocab = vocab.groupBy { case (syms, _) => refApply(syms, a, b) }
            .map { case (s, m) => s -> m.values.sum }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  private def refSegment(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) {
      case (syms, (a, b)) => refApply(syms, a, b)
    }

  test("classic corpus: learned merges match the reference trainer") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.learn(docs, nMerges = 8)
    val want = refLearn(words, nMerges = 8)
    assert(got == want, s"got $got want $want")
    // the published first merges of this corpus under lex tie-break
    assert(got.take(4) == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // "lowest" was never seen, still segments into learned subwords
    val seg = Bpe.segment(Seq((0L, "lowest")).toDF("doc_id", "text"), got)
      .select("bpe_text").as[String].head()
    assert(seg == "low est")
  }

  test("segment parity with the reference on random words") {
    val rnd = new scala.util.Random(43)
    val alpha = "abcd"
    def word() = (0 until (1 + rnd.nextInt(8)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val corpus = (0 until 300).map(_ => word())
    val docs = corpus.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(3)
    val merges = Bpe.learn(docs, nMerges = 12)
    assert(merges == refLearn(corpus, nMerges = 12))
    val got = Bpe.segment(docs, merges)
      .orderBy("doc_id").select("n_bpe_tokens", "bpe_text")
      .as[(Long, String)].collect()
    val want = corpus.grouped(10).map { ws =>
      val segs = ws.map(w => refSegment(w, merges))
      (segs.map(_.length.toLong).sum, segs.map(_.mkString(" ")).mkString(" | "))
    }.toSeq
    assert(got.toSeq == want)
  }

  test("fold semantics: odd runs, consecutive runs, mid-symbol non-match") {
    def seg(text: String, merges: Seq[(String, String)]) =
      Bpe.segment(Seq((0L, text)).toDF("doc_id", "text"), merges)
        .select("bpe_text").as[String].head()
    // merge (a,a) over "aaa" → (aa)(a): a fused symbol never re-merges
    assert(seg("aaa", Seq(("a", "a"))) == "aa a")
    // CONSECUTIVE occurrences all merge — the case a plain string
    // replace gets wrong (shared boundary sentinel)
    assert(seg("abab", Seq(("a", "b"))) == "ab ab")
    assert(seg("bdbdbd", Seq(("b", "d"))) == "bd bd bd")
    // after (a,b)→ab, a following (b,c) merge must NOT fire inside
    // the fused "ab" symbol of "abc": symbols are [ab, c], not [a, bc]
    assert(seg("abc", Seq(("a", "b"), ("b", "c"))) == "ab c")
  }

  test("codegen segment expression is bit-equal to the fold twin") {
    val rnd = new scala.util.Random(47)
    val alpha = "abce"
    def word() = (0 until (1 + rnd.nextInt(9)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val texts = (0 until 60).map(i =>
      (i.toLong, (0 until (1 + rnd.nextInt(6))).map(_ => word()).mkString(" ")))
    // edge shapes: single word, repeated pair runs, 1-char words
    val docs = (texts ++ Seq((1000L, "abab"), (1001L, "a"), (1002L, "a b a b")))
      .toDF("doc_id", "text").repartition(3)
    val merges = Seq(("a", "b"), ("ab", "c"), ("e", "e"), ("c", "e"))
    val fast = Bpe.segment(docs, merges).orderBy("doc_id").collect().map(_.toSeq)
    val fold = Bpe.segmentFold(docs, merges).orderBy("doc_id").collect().map(_.toSeq)
    assert(fast.toSeq == fold.toSeq)
    // non-BMP characters: both paths must split by CODE POINT — a
    // UTF-16 split would shatter the surrogate pair into two symbols
    val emoji = Seq((0L, "ab 😀ab c😀"))
      .toDF("doc_id", "text")
    val fastE = Bpe.segment(emoji, merges).select("bpe_text").as[String].head()
    val foldE = Bpe.segmentFold(emoji, merges).select("bpe_text").as[String].head()
    assert(fastE == foldE, s"surrogate divergence: '$fastE' vs '$foldE'")
    assert(fastE == "ab | 😀 ab | c 😀")
  }

  test("FixtureMerges is exactly what learn produces on the sf0.01 fixture") {
    // the catalog query embeds this table as literals (its oracle SQL
    // must be scale-independent); this pins the frozen literal to the
    // live learner so the two cannot drift apart silently
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(Bpe.learn(docs, nMerges = 10) == Bpe.FixtureMerges)
  }

  test("graft_bpe_segment is registered for SQL and agrees with the operator") {
    Seq((0L, "lowest lower")).toDF("doc_id", "text").createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql(
      "SELECT graft_bpe_segment(text, 'e s,es t,l o,lo w') AS s FROM bpe_docs")
      .as[String].head()
    val viaOp = Bpe.segment(Seq((0L, "lowest lower")).toDF("doc_id", "text"),
        Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
      .select("bpe_text").as[String].head()
    assert(viaSql == viaOp && viaSql == "low est | low e r")
    // malformed merge table fails at analysis, not silently
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_bpe_segment(text, 'e') FROM bpe_docs").collect()
    }
    assert(ex.getMessage.contains("left right") ||
      Option(ex.getCause).exists(_.getMessage.contains("left right")))
  }

  test("learning is deterministic and respects minCount") {
    val docs = Seq((0L, "ab ab ab cd cd xy")).toDF("doc_id", "text")
    val m1 = Bpe.learn(docs, nMerges = 10, minCount = 2)
    val m2 = Bpe.learn(docs, nMerges = 10, minCount = 2)
    assert(m1 == m2)
    // xy occurs once — its pair never reaches minCount
    assert(m1 == Seq(("a", "b"), ("c", "d")))
  }
}
