package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seventeen astronauts carefully measure gravitational anomalies near " +
    "the ancient observatory during a long cold winter night in montana"
  private val nearDup = base.replace("cold winter", "cold snowy winter")
  private val other = "completely unrelated content about cooking pasta " +
    "with garlic butter sauce and fresh basil leaves from the garden " +
    "served alongside a crisp white wine on a warm summer evening"

  private def docs = Seq(
    (0L, base, "en", base.length.toLong),
    (1L, nearDup, "en", nearDup.length.toLong),
    (2L, other, "en", other.length.toLong),
    (3L, base, "en", base.length.toLong) // exact dup of 0
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("exact dedup keeps one row per key") {
    assert(Dedup.exact(docs, Seq("text")).count() == 3)
  }

  test("deterministic exact dedup keeps the min-tiebreaker survivor") {
    val kept = Dedup.exactKeepFirst(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L)) // doc 3 (dup of 0) dropped, 0 kept
  }

  test("minhash LSH finds near-dup and exact-dup pairs, not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, k = 64, bands = 16,
      shingleSize = 3, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)), "exact dup must collide in every band")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L)),
      s"near dup should survive LSH + jaccard>=0.5, got $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc paired")
  }

  test("minhash signature is deterministic across runs") {
    val a = Dedup.minhashSignatures(docs).orderBy("doc_id").collect().map(_.toSeq)
    val b = Dedup.minhashSignatures(docs).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("simhash: identical docs distance 0, near-dup close, unrelated far") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(ham(0L, 3L) == 0)
    assert(ham(0L, 1L) < ham(0L, 2L),
      s"near-dup ${ham(0L, 1L)} should beat unrelated ${ham(0L, 2L)}")
    val pairs = Dedup.simhashNearDups(docs, maxDist = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("ngram jaccard pairs: blocked self-join finds the dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, lenBucket = 1000, threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("connected components: chains close transitively, min id wins") {
    // components: {1,2,3,4} (a chain), {10,11}, singletons absent
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components agree with naive BFS on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    // naive closure on the driver
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def component(start: Long): Set[Long] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen
    }
    val expect = adj.keys.map(n => n -> component(n).min).toMap
    // both paths must agree with the closure: the driver union–find
    // fast path (default) and the distributed min-label loop
    // (forced by a zero driver threshold)
    val fast = Dedup.connectedComponents(edges.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toMap
    val loop = Dedup.connectedComponents(edges.toDF("a_id", "b_id"),
        driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == expect)
    assert(loop == expect)
  }

  test("embedding near-dups: duplicate vector pairs at cosine 1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f), 0),
      (1L, Array(1.0f, 0.0f, 2.0f), 0),  // identical
      (2L, Array(-1.0f, 3.0f, 0.5f), 0), // different
      (3L, Array(1.0f, 0.0f, 2.0f), 1)   // identical but other block
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDups(emb, threshold = 0.99)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(pairs.head._3 == 1.0)
  }
}
