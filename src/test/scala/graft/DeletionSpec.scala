package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.etl.DedupIngest

/** Deletion/retraction lifecycle (r12 VERDICT #1/#7): tombstone-aware
  * probes and compaction for the persisted IVF-PQ and binary index
  * families, and corpus retraction/retention for the dedup ingest
  * layouts. The pins: a deleted id is NEVER returned (plain probe,
  * filtered probe, delta path, post-compaction), a replayed delete is
  * idempotent, compaction physically purges rows AND tombstones
  * (except the replay-protected kept segment), re-append after the
  * purge revives the id, and a retracted/expired corpus key re-admits
  * while retained keys keep rejecting.
  */
class DeletionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val tmp = System.getProperty("java.io.tmpdir")

  // deterministic corpus: 200 vectors + one planted duplicate of vec 0
  // at id 100 (the duplicate is the sharpest deletion probe: before
  // the delete it ranks #1 for query 0 with cosine 1.0)
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat), (i % 10).toInt)
    }
    rows.updated(100, (100L, rows.head._2.clone(), 0))
      .toDF("vec_id", "embedding", "label")
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("c_id")).as[Long].collect().toSet

  test("IVF-PQ: deleted id never returned; each query still ranks k live candidates") {
    val dir = s"$tmp/graft-del-ivfpq"
    Similarity.buildIvfPqIndex(corpus, dir, nlist = 8, m = 8, ksub = 16)
    val q = corpus.filter(col("vec_id") === 0)
    val before = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8, rerank = 300)
    assert(idsOf(before).contains(100L), "planted dup must rank before the delete")
    Similarity.deleteFromIndex(spark, dir, Seq(100L).toDF("vec_id"))
    val after = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8, rerank = 300)
    assert(!idsOf(after).contains(100L), "deleted id surfaced in the probe")
    assert(after.count() == 5,
      "the probe must still rank k LIVE candidates, not post-filter to k-1")
    // exhaustive regime: exactly brute force over the remaining corpus
    val exact = Similarity.bruteForceTopK(q,
      corpus.filter(col("vec_id") =!= 100L), k = 5)
    assert(idsOf(after) == idsOf(exact))
    // the filtered and IVF probes honor the same tombstones
    val filt = Similarity.ivfPqIndexedTopKFiltered(spark, dir,
      corpus.filter(col("vec_id") === 0), col("c_id") >= 0, k = 5,
      nprobe0 = 8, nprobeMax = 8, rerank = 300)
    assert(!idsOf(filt).contains(100L), "filtered probe leaked a deleted id")
  }

  test("IVF-PQ: tombstones shadow the delta path and replayed deletes are idempotent") {
    val dir = s"$tmp/graft-del-ivfpq-delta"
    Similarity.buildIvfPqIndex(corpus, dir, nlist = 8, m = 8, ksub = 16)
    Similarity.deleteFromIndex(spark, dir, Seq(100L).toDF("vec_id"),
      seg = Some("run-del-1"))
    // a delta offering the deleted id must not resurrect it
    val q = corpus.filter(col("vec_id") === 0)
    val merged = Similarity.ivfPqIndexedTopKWithDelta(spark, dir,
      delta = corpus.filter(col("vec_id") === 100L), queries = q, k = 5,
      nprobe = 8, rerank = 300)
    assert(!idsOf(merged).contains(100L), "delta path resurrected a deleted id")
    // replay: the same run-scoped delete again — dynamic overwrite of
    // its own tombstone partition, probe unchanged
    Similarity.deleteFromIndex(spark, dir, Seq(100L).toDF("vec_id"),
      seg = Some("run-del-1"))
    val after = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8, rerank = 300)
    assert(!idsOf(after).contains(100L))
    assert(after.count() == 5)
  }

  test("IVF-PQ: compaction purges rows and tombstones; re-append revives the id") {
    val dir = s"$tmp/graft-del-ivfpq-compact"
    Similarity.buildIvfPqIndex(corpus, dir, nlist = 8, m = 8, ksub = 16)
    Similarity.deleteFromIndex(spark, dir, Seq(100L, 101L).toDF("vec_id"))
    Similarity.compactIndex(spark, dir)
    // physically gone: the data tree no longer holds the ids at all
    val stored = spark.read.parquet(dir).select(col("c_id")).as[Long]
      .collect().toSet
    assert(!stored.contains(100L) && !stored.contains(101L),
      "compaction did not physically purge tombstoned rows")
    // tombstone sidecar cleared
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(dir + "_tombstones")),
      "tombstones must clear once their rows are purged")
    val q = corpus.filter(col("vec_id") === 0)
    val after = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8, rerank = 300)
    assert(!idsOf(after).contains(100L) && after.count() == 5)
    // re-append AFTER the purge: the id is live again (the documented
    // delete-shadows-until-compaction contract)
    Similarity.appendToIvfPqIndex(spark, dir,
      corpus.filter(col("vec_id") === 100L))
    val revived = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8, rerank = 300)
    assert(idsOf(revived).contains(100L),
      "an id re-appended after the purge must be searchable again")
  }

  test("IVF-PQ: keepSeg compaction retains the kept segment's rows AND their tombstones") {
    val dir = s"$tmp/graft-del-ivfpq-keepseg"
    Similarity.buildIvfPqIndex(corpus.filter(col("vec_id") < 150), dir,
      nlist = 8, m = 8, ksub = 16)
    // streaming-shaped append of [150, 200) under a run-scoped segment
    Similarity.appendToIvfPqIndex(spark, dir,
      corpus.filter(col("vec_id") >= 150), seg = Some("run-b7"))
    // delete one build-time id and one kept-segment id
    Similarity.deleteFromIndex(spark, dir, Seq(100L, 160L).toDF("vec_id"))
    Similarity.compactIndex(spark, dir, keepSeg = Some("run-b7"))
    val rows = spark.read.parquet(dir)
    // the folded id is purged; the kept segment's row SURVIVES the
    // fold (a replay rewrites that partition whole) but its tombstone
    // is retained, so the probe still excludes it
    val stored = rows.select(col("c_id")).as[Long].collect().toSet
    assert(!stored.contains(100L), "folded tombstoned row not purged")
    assert(stored.contains(160L),
      "kept-segment row must survive the fold (replay safety)")
    // probe with 160's own embedding under a fresh id: were 160 live,
    // it would rank #1 at cosine 1.0 — the pin cannot be vacuous
    val probeQ = corpus.filter(col("vec_id") === 160L)
      .select(lit(9160L).as("vec_id"), col("embedding"))
    val probe = Similarity.ivfPqIndexedTopK(spark, dir, probeQ, k = 5,
      nprobe = 8, rerank = 300)
    assert(!idsOf(probe).contains(160L),
      "retained tombstone must keep shadowing the kept-segment row")
    // a second compaction (no kept segment) purges the remainder
    Similarity.compactIndex(spark, dir)
    val stored2 = spark.read.parquet(dir).select(col("c_id")).as[Long]
      .collect().toSet
    assert(!stored2.contains(160L))
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(dir + "_tombstones")))
  }

  test("binary family: delete, delta shadow, compact-purge, revive") {
    val dir = s"$tmp/graft-del-binary"
    Similarity.buildBinaryIndex(corpus, dir, metaCols = Seq("label"))
    val q = corpus.filter(col("vec_id") === 0)
    assert(idsOf(Similarity.binaryIndexedTopK(spark, dir, q, k = 5,
      rerank = 300)).contains(100L))
    Similarity.deleteFromIndex(spark, dir, Seq(100L).toDF("vec_id"))
    val after = Similarity.binaryIndexedTopK(spark, dir, q, k = 5,
      rerank = 300)
    assert(!idsOf(after).contains(100L) && after.count() == 5)
    // the filtered probe honors tombstones too (label 0 covers id 100)
    val filt = Similarity.binaryIndexedTopK(spark, dir, q, k = 5,
      rerank = 300, predicate = Some(col("label") === 0))
    assert(!idsOf(filt).contains(100L))
    // delta shadow
    val merged = Similarity.binaryIndexedTopKWithDelta(spark, dir,
      delta = corpus.filter(col("vec_id") === 100L), queries = q, k = 5,
      rerank = 300)
    assert(!idsOf(merged).contains(100L))
    // compact purges + clears; re-append revives
    Similarity.compactBinaryIndex(spark, dir)
    assert(!spark.read.parquet(dir).select(col("c_id")).as[Long]
      .collect().toSet.contains(100L))
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(dir + "_tombstones")))
    Similarity.appendToBinaryIndex(spark, dir,
      corpus.filter(col("vec_id") === 100L))
    assert(idsOf(Similarity.binaryIndexedTopK(spark, dir, q, k = 5,
      rerank = 300)).contains(100L))
  }

  test("IVF family: the probe honors tombstones") {
    val dir = s"$tmp/graft-del-ivf"
    Similarity.buildIvfIndex(corpus, dir, nlist = 8)
    val q = corpus.filter(col("vec_id") === 0)
    assert(idsOf(Similarity.ivfIndexedTopK(spark, dir, q, k = 5,
      nprobe = 8)).contains(100L))
    Similarity.deleteFromIndex(spark, dir, Seq(100L).toDF("vec_id"))
    val after = Similarity.ivfIndexedTopK(spark, dir, q, k = 5, nprobe = 8)
    assert(!idsOf(after).contains(100L) && after.count() == 5)
  }

  // ---------------------------------------------------------------- //
  // Dedup corpus retraction / retention                              //
  // ---------------------------------------------------------------- //

  private def freshDirs(name: String): (String, String) = {
    val corpusDir = s"$tmp/graft-retract-$name"
    val ckpt = s"$tmp/graft-retract-$name-ckpt"
    for (d <- Seq(corpusDir, corpusDir + "_fps", corpusDir + "_bands", ckpt)) {
      val fs = fsOf(d)
      fs.delete(new org.apache.hadoop.fs.Path(d), true)
    }
    (corpusDir, ckpt)
  }

  test("retract: the key re-admits afterwards; untouched keys keep rejecting") {
    val (corpusDir, ckpt) = freshDirs("exact")
    val docs = (0 until 50).map(i => (s"k$i", i.toLong, s"text $i"))
      .toDF("key", "ts", "text")
    DedupIngest.bootstrapCorpus(spark, docs, corpusDir, "key", "ts")
    // a duplicate batch is fully rejected (and builds a bloom chain)
    val dup = Seq(("k7", 99L, "text 7 again"), ("k8", 99L, "text 8 again"))
      .toDF("key", "ts", "text")
    assert(DedupIngest.admitBatchIncremental(spark, dup, corpusDir, ckpt,
      batchId = 0, key = "key", tiebreaker = "ts", runTag = "rt") == 0L)
    // retract k7: docs AND fingerprints drop, epoch stamps
    assert(DedupIngest.retract(spark, corpusDir, Seq("k7").toDF("key"),
      "key") == 1L)
    val fps = spark.read.parquet(corpusDir + "_fps").select("key")
      .as[String].collect().toSet
    assert(!fps.contains("k7") && fps.contains("k8"))
    assert(!spark.read.parquet(corpusDir).select("key").as[String]
      .collect().toSet.contains("k7"))
    // re-admission: k7 admits now (even against the prior chain — the
    // confirm join runs on the retracted fingerprint index); k8 still
    // rejects
    assert(DedupIngest.admitBatchIncremental(spark, dup, corpusDir, ckpt,
      batchId = 1, key = "key", tiebreaker = "ts", runTag = "rt") == 1L)
    val keys = spark.read.parquet(corpusDir).select("key").as[String]
      .collect().toList
    assert(keys.count(_ == "k7") == 1 && keys.count(_ == "k8") == 1)
    // idempotent re-retract of a now-absent key: zero, no error
    assert(DedupIngest.retract(spark, corpusDir,
      Seq("nosuch").toDF("key"), "key") == 0L)
  }

  test("retractNearDup: a retracted doc stops suppressing its near-dups") {
    val (corpusDir, _) = freshDirs("neardup")
    val baseText = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronauts carefully measure gravitational anomalies near " +
      "the ancient observatory during a long cold winter night in montana"
    val unrelated = "completely unrelated content about cooking pasta " +
      "with garlic butter sauce and fresh basil leaves from the garden " +
      "served alongside a crisp white wine on a warm summer evening"
    val base = Seq((1L, baseText), (3L, unrelated)).toDF("doc_id", "text")
    assert(DedupIngest.admitBatchNearDup(spark, base, corpusDir,
      batchId = 0, idCol = "doc_id", textCol = "text", runTag = "nd") == 2L)
    // a near-dup of doc 1 is rejected against the standing corpus
    val near = Seq((2L, baseText.replace("cold winter", "cold snowy winter")))
      .toDF("doc_id", "text")
    assert(DedupIngest.admitBatchNearDup(spark, near, corpusDir,
      batchId = 1, idCol = "doc_id", textCol = "text", runTag = "nd") == 0L)
    // retract doc 1: docs AND band-index postings drop
    assert(DedupIngest.retractNearDup(spark, corpusDir,
      Seq(1L).toDF("doc_id"), "doc_id") == 1L)
    assert(spark.read.parquet(corpusDir + "_bands")
      .filter(col("_c_id") === 1L).isEmpty)
    // the near-dup now admits — the retracted doc no longer suppresses
    assert(DedupIngest.admitBatchNearDup(spark, near, corpusDir,
      batchId = 2, idCol = "doc_id", textCol = "text", runTag = "nd") == 1L)
  }

  test("retainCorpus: whole-partition drop + straddler rewrite; dropped keys re-admit, retained reject") {
    val (corpusDir, ckpt) = freshDirs("retain")
    // two ingest batches with disjoint time ranges (batch 0 entirely
    // below the cutoff → whole-partition drop) plus a straddling
    // bootstrap (rows on both sides → row-level rewrite)
    val boot = Seq(("old1", 5L, "a"), ("new1", 25L, "b"))
      .toDF("key", "ts", "text")
    DedupIngest.bootstrapCorpus(spark, boot, corpusDir, "key", "ts")
    val b0 = Seq(("old2", 7L, "c"), ("old3", 9L, "d")).toDF("key", "ts", "text")
    assert(DedupIngest.admitBatchIncremental(spark, b0, corpusDir, ckpt,
      batchId = 0, key = "key", tiebreaker = "ts", runTag = "rc") == 2L)
    val dropped = DedupIngest.retainCorpus(spark, corpusDir, "key", "ts",
      cutoff = lit(20L))
    assert(dropped == 3L, s"expected 3 expired rows, got $dropped")
    // batch 0's partition is GONE (whole drop), the bootstrap
    // partition survived with only the retained row
    val fs = fsOf(corpusDir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(corpusDir,
      "_ingest_batch=rc-0")))
    val keys = spark.read.parquet(corpusDir).select("key").as[String]
      .collect().toSet
    assert(keys == Set("new1"))
    assert(spark.read.parquet(corpusDir + "_fps").select("key").as[String]
      .collect().toSet == Set("new1"))
    // dropped keys re-admit; the retained key keeps rejecting
    val retry = Seq(("old2", 30L, "c2"), ("new1", 30L, "b2"))
      .toDF("key", "ts", "text")
    assert(DedupIngest.admitBatchIncremental(spark, retry, corpusDir, ckpt,
      batchId = 1, key = "key", tiebreaker = "ts", runTag = "rc") == 1L)
    assert(spark.read.parquet(corpusDir).filter(col("key") === "old2")
      .count() == 1L)
    assert(spark.read.parquet(corpusDir).filter(col("key") === "new1")
      .count() == 1L)
  }
}
