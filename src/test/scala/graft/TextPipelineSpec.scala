package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextStats

/** Pins for the corpus-preparation operators added on top of the
  * basic text stats: PII scrubbing, repetition gates, sequence
  * packing.
  */
class TextPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("piiScrub folds emails before numbers and counts both") {
    val df = Seq(
      (1L, "contact bob42@mail.example.com or call 5551234"),
      (2L, "no pii here"),
      (3L, "ids 12 34 56")
    ).toDF("event_id", "props")
    val out = TextStats.piiScrub(df, "event_id", "props")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // the email's own digits are folded with it, not double-counted
    assert(out(0) == ((1L, "contact <EMAIL> or call <NUM>", 2L)))
    assert(out(1) == ((2L, "no pii here", 0L)))
    assert(out(2) == ((3L, "ids <NUM> <NUM> <NUM>", 3L)))
  }

  test("repetitionStats: top token share and duplicate ratio") {
    val df = Seq(
      (1L, "a a a b"),     // top=3/4, dup = 1 - 2/4
      (2L, "x y z")        // no repetition
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(df)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 0.75, 0.5)))
    assert(out(1) == ((2L, 0.333333, 0.0)))
  }

  test("packChunks: shard-local offsets cut at the token budget") {
    val df = Seq(
      (1L, "s1", "t t t"),      // 3 tokens, offset 0, chunk 0
      (2L, "s1", "t t t t"),    // offset 3, chunk 0
      (3L, "s1", "t t"),        // offset 7, chunk 1 (budget 4)
      (4L, "s2", "t")           // other shard restarts at 0
    ).toDF("doc_id", "source", "text")
    val out = TextStats.packChunks(df, budget = 4)
      .select("doc_id", "offset", "chunk_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L), (4L, 0L, 0L)))
  }
}
