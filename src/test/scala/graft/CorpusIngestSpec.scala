package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.CorpusIngest

/** Streaming corpus builder (etl.CorpusIngest): per micro-batch
  * quality gate → fixed-bench decontamination → cross-batch dedup
  * admission, composed end-to-end.
  */
class CorpusIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private implicit def ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private val good = words("alpha", 25)
  private val good2 = words("beta", 25)
  private val good3 = words("kappa", 25)
  private val contaminated = words("gamma", 20) + " " + words("bench", 5)
  private val short5 = words("tiny", 5)
  private val benchDoc = words("bench", 30)

  private def bench = Seq((100L, benchDoc)).toDF("doc_id", "text")

  private def drain(stream: MemoryStream[(Long, String, String, String)],
                    dir: String, cp: String): Unit = {
    val q = CorpusIngest.start(
      stream.toDF().toDF("doc_id", "text", "lang", "source"),
      bench, dir, cp, trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("stages compose per batch; dedup state spans batches") {
    val dir = Files.createTempDirectory("corpus-ingest").toString + "/corpus"
    val cp = Files.createTempDirectory("corpus-ingest-cp").toString
    val stream = MemoryStream[(Long, String, String, String)]

    // batch 1: good admitted; short + contaminated rejected by their
    // stages; in-batch exact dup keeps the lower id
    stream.addData((0L, good, "en", "src1"), (1L, short5, "en", "src1"),
      (2L, contaminated, "en", "src2"), (3L, good, "en", "src3"))
    drain(stream, dir, cp)
    val after1 = spark.read.parquet(dir)
    assert(after1.select("doc_id").as[Long].collect().toSet == Set(0L))
    // admitted rows carry the full payload + split
    val row = after1.head()
    assert(row.getAs[String]("text") == good)
    assert(row.getAs[Long]("n_tok") == 25L)
    assert(row.getAs[String]("split") ==
      (if ((0L * 2654435761L) % 100 < 90) "train" else "eval"))

    // batch 2: cross-batch dup of good rejected; two new docs admitted
    stream.addData((4L, good, "en", "src1"), (5L, good2, "en", "src2"),
      (6L, good3, "en", "src1"))
    drain(stream, dir, cp)
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
      == Set(0L, 5L, 6L))
  }

  test("backfill-then-stream handoff: prep(keepText) seeds the streaming corpus") {
    // the production sequence: a batch backfill builds the corpus,
    // then the resident ingest continues on it — backfilled texts
    // must block later streamed duplicates
    val dir = Files.createTempDirectory("corpus-handoff").toString + "/corpus"
    val cp = Files.createTempDirectory("corpus-handoff-cp").toString
    val backfillDocs = Seq(
      (0L, good, "en", "src1"), (1L, short5, "en", "src1"),
      (6L, benchDoc, "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    graft.ops.CorpusPipeline.prep(backfillDocs, keepText = true)
      .write.parquet(dir)
    assert(spark.read.parquet(dir).columns.contains("text"),
      "backfill shape must carry the admission key")

    val stream = MemoryStream[(Long, String, String, String)]
    // a dup of the BACKFILLED doc plus a new one
    stream.addData((10L, good, "en", "src2"), (11L, good2, "en", "src1"))
    drain(stream, dir, cp)
    val ids = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 11L), s"backfilled text failed to block its dup: $ids")
  }

  test("streamed result equals the batch pipeline on the union of batches") {
    // the streaming builder is prep's resident twin: over the same
    // docs (no intra-stream ordering surprises: distinct texts), the
    // admitted doc_id set must match prep's — modulo prep's
    // benchSource convention, emulated here with an explicit src0 doc
    val docs = Seq(
      (0L, good, "en", "src1"), (1L, short5, "en", "src1"),
      (2L, contaminated, "en", "src2"), (3L, good, "en", "src3"),
      (4L, good2, "en", "src2"), (5L, good3, "en", "src1"),
      (6L, benchDoc, "en", "src0"))
    val batchResult = graft.ops.CorpusPipeline
      .prep(docs.toDF("doc_id", "text", "lang", "source"))
      .select("doc_id").as[Long].collect().toSet

    val dir = Files.createTempDirectory("corpus-twin").toString + "/corpus"
    val cp = Files.createTempDirectory("corpus-twin-cp").toString
    val stream = MemoryStream[(Long, String, String, String)]
    // stream the NON-bench docs in two batches (the bench set is the
    // stream's fixed held-out side, not streamed)
    stream.addData(docs.take(3).filter(_._4 != "src0"): _*)
    drain(stream, dir, cp)
    stream.addData(docs.drop(3).filter(_._4 != "src0"): _*)
    drain(stream, dir, cp)
    val streamed = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(streamed == batchResult, s"streamed $streamed vs batch $batchResult")
  }
}
