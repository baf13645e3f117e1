package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IndexIngest
import graft.ops.Similarity

/** Streaming ANN index maintenance ([[graft.etl.IndexIngest]]):
  * exactly-once segment appends over a frozen persisted model.
  */
class IndexIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private implicit def ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }

  private def emb(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def drain(stream: MemoryStream[(Long, Array[Float])], dir: String,
                    cp: String): Unit = {
    val q = IndexIngest.startIvfPqAppend(
      stream.toDF().toDF("vec_id", "embedding"), dir, cp,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }

  private def contents(dir: String): Set[(Long, Int, String)] =
    spark.read.parquet(dir)
      .select(col("c_id"), col("cell"), hex(col("code")).as("code"))
      .as[(Long, Int, String)].collect().toSet

  test("streamed appends equal the one-shot append; crash-replay is exactly-once") {
    val base = emb(0 until 120)
    val tmp = Files.createTempDirectory("idx-ingest").toString
    val streamed = s"$tmp/streamed"
    val oneShot = s"$tmp/oneshot"
    val cp = s"$tmp/cp"
    Similarity.buildIvfPqIndex(base, streamed, nlist = 8, m = 8, ksub = 16)
    Similarity.buildIvfPqIndex(base, oneShot, nlist = 8, m = 8, ksub = 16)

    val stream = MemoryStream[(Long, Array[Float])]
    val b0 = (200 until 240).map(i => (i.toLong, vec(i)))
    val b1 = (240 until 280).map(i => (i.toLong, vec(i)))
    stream.addData(b0: _*)
    drain(stream, streamed, cp)
    // crash-replay: batch 1 runs ONCE outside the stream (all writes
    // land, the checkpoint never hears of it), then the stream replays
    // the same rows under the same batch id — the segment overwrite
    // must absorb the duplicate run, not double the rows
    IndexIngest.appendBatch(b1.toDF("vec_id", "embedding"), streamed, cp,
      batchId = 1L)
    stream.addData(b1: _*)
    drain(stream, streamed, cp)

    Similarity.appendToIvfPqIndex(spark, oneShot,
      emb(200 until 280))
    assert(contents(streamed) === contents(oneShot))
    assert(spark.read.parquet(streamed).count() === 200L)

    // search parity through both layouts, probing all cells with
    // rerank > corpus: exact brute force either way
    val q = emb(0 until 5)
    def res(d: String) = Similarity.ivfPqIndexedTopK(spark, d, q, k = 5,
        nprobe = 8, rerank = 300)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(res(streamed) === res(oneShot))
  }

  test("deduped pipeline: near-dups rejected end-to-end, survivors indexed, replay exactly-once") {
    val tmp = Files.createTempDirectory("idx-dedup-pipe").toString
    val (corpus, idx, cp) = (s"$tmp/corpus", s"$tmp/idx", s"$tmp/cp")
    def row(id: Long, of: Int): (Long, Array[Float]) = (id, vec(of))
    // seed: ids 0..19 plus an exact in-seed dup of id 3 — the
    // bootstrap must reject it with the operator's own sequential
    // semantics before the index model ever sees it
    val seed = ((0 until 20).map(i => row(i.toLong, i)) :+ row(200L, 3))
      .toDF("vec_id", "embedding")
    IndexIngest.bootstrapDedupedIvfPq(seed, corpus, idx,
      nlist = 8, m = 8, ksub = 16)
    assert(spark.read.parquet(idx).count() === 20L)

    val stream = MemoryStream[(Long, Array[Float])]
    // batch 0: 20 new + a dup of CORPUS id 5 + a dup of IN-BATCH id 21
    val b0 = (20 until 40).map(i => row(i.toLong, i)) ++
      Seq(row(201L, 5), row(202L, 21))
    stream.addData(b0: _*)
    val q1 = IndexIngest.startDedupedIvfPqAppend(
      stream.toDF().toDF("vec_id", "embedding"), corpus, idx, cp,
      trigger = Trigger.AvailableNow())
    q1.awaitTermination()
    // crash-replay of batch 1: both stages commit once outside the
    // stream, then the stream replays the same rows under the same id
    val b1 = (40 until 50).map(i => row(i.toLong, i)) :+ row(203L, 25)
    IndexIngest.dedupedAppendBatch(b1.toDF("vec_id", "embedding"),
      corpus, idx, cp, batchId = 1L)
    stream.addData(b1: _*)
    val q2 = IndexIngest.startDedupedIvfPqAppend(
      stream.toDF().toDF("vec_id", "embedding"), corpus, idx, cp,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()

    // exactly the survivors, exactly once, in BOTH stores
    val want = (0 until 50).map(_.toLong).toSet
    val idxRows = spark.read.parquet(idx).select("c_id").as[Long].collect()
    assert(idxRows.toSet === want, "index contents diverged")
    assert(idxRows.length === 50, "replay duplicated index rows")
    assert(spark.read.parquet(corpus).select("vec_id").as[Long]
      .collect().toSet === want)
    // a rejected near-dup is absent from search results even in the
    // exhaustive regime; its admitted twin is reachable at cosine 1
    val probe = Seq(row(999L, 5)).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqIndexedTopK(spark, idx, probe, k = 3,
      nprobe = 8, rerank = 100).filter(col("rnk") === 1).head()
    assert(top.getAs[Long]("c_id") === 5L)
    assert(top.getAs[Double]("cosine") === 1.0)
  }

  test("deduped pipeline soak: 12 batches with repeated crash-replays stay exactly-once") {
    // every batch is first run as a "crashed" attempt (both stages
    // commit, the checkpoint never hears of it) and then replayed by
    // the stream under the same id — the hardest schedule the
    // exactly-once construction must absorb. Batches mix new ids,
    // near-dups of bootstrap/corpus ids, and in-batch dups; the model
    // is the sequential-greedy admission semantics.
    val rnd = new scala.util.Random(61)
    val tmp = Files.createTempDirectory("idx-pipe-soak").toString
    val (corpus, idx, cp) = (s"$tmp/corpus", s"$tmp/idx", s"$tmp/cp")
    IndexIngest.bootstrapDedupedIvfPq(
      (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      corpus, idx, nlist = 8, m = 8, ksub = 16)
    var admitted = (0 until 30).map(_.toLong).toSet
    var nextId = 1000L
    val stream = MemoryStream[(Long, Array[Float])]
    for (b <- 0 until 12) {
      // new vectors (admitted), plus dups of already-admitted seeds
      // (rejected: exact copies, cosine 1 ≥ any threshold), plus one
      // in-batch dup pair (second id rejected)
      val newSeeds = (0 until 6).map(_ => { nextId += 1; nextId })
      val dupOf = admitted.toSeq.sorted.apply(rnd.nextInt(admitted.size))
      val pairSeed = { nextId += 1; nextId }
      val batch =
        newSeeds.map(id => (id, vec(id.toInt))) ++
        Seq(({ nextId += 1; nextId }, vec(dupOf.toInt))) ++
        Seq((pairSeed, vec(pairSeed.toInt)),
          ({ nextId += 1; nextId }, vec(pairSeed.toInt)))
      // crashed attempt, then the stream replays the same rows/id
      IndexIngest.dedupedAppendBatch(batch.toDF("vec_id", "embedding"),
        corpus, idx, cp, batchId = b.toLong)
      stream.addData(batch: _*)
      val q = IndexIngest.startDedupedIvfPqAppend(
        stream.toDF().toDF("vec_id", "embedding"), corpus, idx, cp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
      admitted ++= newSeeds :+ pairSeed
    }
    val idxIds = spark.read.parquet(idx).select("c_id").as[Long].collect()
    assert(idxIds.toSet === admitted, "index diverged from the admission model")
    assert(idxIds.length === admitted.size, "crash-replays duplicated index rows")
    assert(spark.read.parquet(corpus).select("vec_id").as[Long]
      .collect().toSet === admitted)
  }

  test("binary family: streamed appends crash-replay exactly-once; compaction folds; describe covers the layout") {
    // the r10 gap: appendToBinaryIndex was a blind parquet append
    // with a replay caveat while the zero-training tier's own pitch
    // (the churning-corpus index) makes it the family MOST likely to
    // sit under a stream. Soak the full treatment: every batch runs
    // once as a crashed attempt (writes land, checkpoint silent) and
    // is then replayed by the stream under the same id, with
    // in-stream auto-compaction firing mid-run.
    val tmp = Files.createTempDirectory("idx-binary-ingest").toString
    val (streamed, oneShot, cp) = (s"$tmp/streamed", s"$tmp/oneshot", s"$tmp/cp")
    val base = emb(0 until 100)
    Similarity.buildBinaryIndex(base, streamed, nBits = 124)
    Similarity.buildBinaryIndex(base, oneShot, nBits = 124)
    val stream = MemoryStream[(Long, Array[Float])]
    for (b <- 0 until 6) {
      val rows = (200 + b * 20 until 220 + b * 20).map(i => (i.toLong, vec(i)))
      IndexIngest.appendBinaryBatch(rows.toDF("vec_id", "embedding"),
        streamed, cp, batchId = b.toLong, autoCompactSegments = 3)
      stream.addData(rows: _*)
      val q = IndexIngest.startBinaryAppend(
        stream.toDF().toDF("vec_id", "embedding"), streamed, cp,
        trigger = Trigger.AvailableNow(), autoCompactSegments = 3)
      q.awaitTermination()
    }
    Similarity.appendToBinaryIndex(spark, oneShot, emb(200 until 320))
    // content parity with the one-shot twin, and no replay-duplicates
    def stored(d: String) = spark.read.parquet(d)
      .select(col("c_id"), col("c_sig")).as[(Long, Seq[Long])].collect()
    assert(stored(streamed).length === 220, "crash-replays duplicated rows")
    assert(stored(streamed).toSet === stored(oneShot).toSet)
    // search parity in the exhaustive regime (rerank > corpus)
    val q = emb(0 until 5)
    def res(d: String) = Similarity.binaryIndexedTopK(spark, d, q, k = 5,
      rerank = 400).as[(Long, Long, Double, Long)].collect().toSet
    assert(res(streamed) === res(oneShot))
    // auto-compaction bounded segment growth mid-run: without it the
    // 6 crash-attempts + 6 replays would have left base + 6 segments
    assert(Similarity.segmentNames(spark, streamed).size <= 4,
      s"segments unbounded: ${Similarity.segmentNames(spark, streamed)}")
    // describeIndex covers the binary layout: model/nbits from the
    // meta, no cell structure, coherent epochs, full row accounting
    val d = Similarity.describeIndex(spark, streamed).collect()
    assert(d.nonEmpty && d.forall(r =>
      r.getAs[String]("model") == "binary" && r.getAs[Int]("nbits") == 124 &&
        r.getAs[Long]("cells") == 0L && r.getAs[Boolean]("epoch_coherent")))
    assert(d.map(_.getAs[Long]("rows")).sum === 220L)
    // explicit compaction folds to one base segment, results unchanged
    val before = res(streamed)
    Similarity.compactBinaryIndex(spark, streamed)
    assert(Similarity.segmentNames(spark, streamed) === Seq("base"))
    assert(res(streamed) === before)
    assert(spark.read.parquet(streamed).count() === 220L)
    val folded = Similarity.describeIndex(spark, streamed).collect()
    assert(folded.length == 1 && folded.head.getAs[Long]("rows") === 220L &&
      folded.head.getAs[Boolean]("epoch_coherent"))
  }

  test("deduped binary pipeline: survivors indexed exactly-once under crash-replay") {
    val tmp = Files.createTempDirectory("idx-binary-pipe").toString
    val (corpus, idx, cp) = (s"$tmp/corpus", s"$tmp/idx", s"$tmp/cp")
    // seed with an exact in-seed dup of id 3 — rejected at bootstrap
    val seed = ((0 until 20).map(i => (i.toLong, vec(i))) :+ (200L, vec(3)))
      .toDF("vec_id", "embedding")
    IndexIngest.bootstrapDedupedBinary(seed, corpus, idx, nBits = 124)
    assert(spark.read.parquet(idx).count() === 20L)
    val stream = MemoryStream[(Long, Array[Float])]
    // batch 0: 20 new + a dup of CORPUS id 5 + a dup of IN-BATCH id 21
    val b0 = (20 until 40).map(i => (i.toLong, vec(i))) ++
      Seq((201L, vec(5)), (202L, vec(21)))
    stream.addData(b0: _*)
    IndexIngest.startDedupedBinaryAppend(
      stream.toDF().toDF("vec_id", "embedding"), corpus, idx, cp,
      trigger = Trigger.AvailableNow()).awaitTermination()
    // crash-replay of batch 1: both stages commit once outside the
    // stream, then the stream replays the same rows under the same id
    val b1 = (40 until 50).map(i => (i.toLong, vec(i))) :+ (203L, vec(25))
    IndexIngest.dedupedBinaryAppendBatch(b1.toDF("vec_id", "embedding"),
      corpus, idx, cp, batchId = 1L)
    stream.addData(b1: _*)
    IndexIngest.startDedupedBinaryAppend(
      stream.toDF().toDF("vec_id", "embedding"), corpus, idx, cp,
      trigger = Trigger.AvailableNow()).awaitTermination()
    // exactly the survivors, exactly once, in BOTH stores
    val want = (0 until 50).map(_.toLong).toSet
    val ids = spark.read.parquet(idx).select("c_id").as[Long].collect()
    assert(ids.toSet === want, "index contents diverged")
    assert(ids.length === 50, "replay duplicated index rows")
    assert(spark.read.parquet(corpus).select("vec_id").as[Long]
      .collect().toSet === want)
    // the rejected near-dup is absent; its admitted twin reachable
    val probe = Seq((999L, vec(5))).toDF("vec_id", "embedding")
    val top = Similarity.binaryIndexedTopK(spark, idx, probe, k = 3,
      rerank = 100).filter(col("rnk") === 1).head()
    assert(top.getAs[Long]("c_id") === 5L)
    assert(top.getAs[Double]("cosine") === 1.0)
  }

  test("lifecycle fuzz: random append/compact/refit interleavings stay exact") {
    // model-based check: the index is mutated by a seeded-random
    // op sequence while a plain Map plays the oracle; after EVERY
    // mutation, exhaustive-regime search (probe all cells, rerank >
    // corpus) must equal brute force over the model — any divergence
    // pinpoints the op that corrupted the index
    val rnd = new scala.util.Random(59)
    val tmp = Files.createTempDirectory("idx-fuzz").toString
    val dir = s"$tmp/idx"
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, Array[Float])] =
      (0 until n).map { _ => nextId += 1; (nextId, vec(nextId.toInt)) }
    var model = fresh(80)
    Similarity.buildIvfPqIndex(model.toDF("vec_id", "embedding"), dir,
      nlist = 8, m = 8, ksub = 16)
    var nlist = 8
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    for (step <- 0 until 6) {
      rnd.nextInt(3) match {
        case 0 =>
          val batch = fresh(20 + rnd.nextInt(20))
          Similarity.appendToIvfPqIndex(spark, dir,
            batch.toDF("vec_id", "embedding"))
          model ++= batch
          ops += s"append(${batch.size})"
        case 1 =>
          Similarity.compactIndex(spark, dir)
          ops += "compact"
        case 2 =>
          nlist = Seq(4, 8, 16)(rnd.nextInt(3))
          Similarity.refitIvfPqIndex(spark, dir, nlist = nlist, m = 8,
            ksub = 16)
          ops += s"refit($nlist)"
      }
      val q = model.take(5).toDF("vec_id", "embedding")
      val got = Similarity.ivfPqIndexedTopK(spark, dir, q, k = 5,
          nprobe = nlist, rerank = model.size + 50)
        .as[(Long, Long, Double, Long)].collect().toSet
      val exact = Similarity.bruteForceTopK(q,
          model.toDF("vec_id", "embedding"), k = 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got === exact,
        s"diverged after step $step: ${ops.mkString(" -> ")}")
      assert(spark.read.parquet(dir).count() === model.size.toLong,
        s"row count diverged after step $step: ${ops.mkString(" -> ")}")
    }
  }

  test("auto-compaction folds segments in-stream; contents and search pinned, crash-replay exact") {
    val base = emb(0 until 100)
    val tmp = Files.createTempDirectory("idx-autocompact").toString
    val (auto, plain, cp) = (s"$tmp/auto", s"$tmp/plain", s"$tmp/cp")
    Similarity.buildIvfPqIndex(base, auto, nlist = 8, m = 8, ksub = 16)
    Similarity.buildIvfPqIndex(base, plain, nlist = 8, m = 8, ksub = 16)

    val stream = MemoryStream[(Long, Array[Float])]
    // 10 batches through the STREAMING entry point with a threshold of
    // 3 — without the policy the run ends at 10+ segments; with it the
    // count must stay bounded by threshold + the in-flight segment.
    // Every batch is also run once as a "crashed" attempt before the
    // stream replays it: the attempt may itself compact, so the replay
    // exercises compact-then-overwrite — the interleave the
    // keep-current-segment rule exists for.
    for (b <- 0 until 10) {
      val batch = (1000 + 40 * b until 1040 + 40 * b)
        .map(i => (i.toLong, vec(i)))
      IndexIngest.appendBatch(batch.toDF("vec_id", "embedding"), auto, cp,
        batchId = b.toLong, autoCompactSegments = 3)
      stream.addData(batch: _*)
      val q = IndexIngest.startIvfPqAppend(
        stream.toDF().toDF("vec_id", "embedding"), auto, cp,
        trigger = Trigger.AvailableNow(), autoCompactSegments = 3)
      q.awaitTermination()
      Similarity.appendToIvfPqIndex(spark, plain,
        batch.toDF("vec_id", "embedding"))
    }
    val segs = Similarity.segmentNames(spark, auto)
    assert(segs.size <= 4, s"auto-compaction failed to bound segments: $segs")
    assert(segs.contains("base"), s"no folded base segment: $segs")
    // compaction must not create, drop, or re-encode a single row
    assert(contents(auto) === contents(plain))
    // search parity in the exhaustive regime: results pinned unchanged
    val q = emb(0 until 5)
    def res(d: String) = Similarity.ivfPqIndexedTopK(spark, d, q, k = 5,
        nprobe = 8, rerank = 600)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(res(auto) === res(plain))
  }

  test("fresh checkpoint's batch ids land on their own segments, never an old run's") {
    val base = emb(0 until 60)
    val tmp = Files.createTempDirectory("idx-ingest-2cp").toString
    val dir = s"$tmp/idx"
    Similarity.buildIvfPqIndex(base, dir, nlist = 8, m = 8, ksub = 16)

    // run 1, batch 0
    val s1 = MemoryStream[(Long, Array[Float])]
    s1.addData((100 until 130).map(i => (i.toLong, vec(i))): _*)
    drain(s1, dir, s"$tmp/cp1")
    // run 2 (FRESH checkpoint), also batch 0, different rows: must ADD
    // to the index — a tag collision would overwrite run 1's segment
    val s2 = MemoryStream[(Long, Array[Float])]
    s2.addData((130 until 160).map(i => (i.toLong, vec(i))): _*)
    drain(s2, dir, s"$tmp/cp2")

    val ids = spark.read.parquet(dir).select("c_id").as[Long].collect().toSet
    assert(ids === (0 until 60).map(_.toLong).toSet ++
      (100 until 160).map(_.toLong).toSet)
  }
}
