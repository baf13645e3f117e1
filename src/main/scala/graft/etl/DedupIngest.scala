package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** Streaming corpus ingest with cross-batch deduplication — the
  * streaming twin of `Dedup.incrementalExact` (the batch admission
  * gate the catalog pins as `ext_dedup_incremental`).
  *
  * Each micro-batch is admitted against the GROWING corpus: a
  * broadcast Bloom over the standing corpus keys prunes the batch to
  * candidates (no false negatives ⇒ bloom-negative rows are
  * definitely new), an exact anti-join confirms, and only admitted
  * rows append. This replaces the unbounded `dropDuplicates` state a
  * naive streaming dedup would accumulate in the state store: the
  * dedup state IS the corpus itself — nothing ages out, nothing is
  * duplicated into RocksDB, and a corpus bootstrapped OUTSIDE the
  * stream (backfill, migration) participates automatically.
  *
  * Exactly-once WITHOUT sink-side commit markers: admission itself is
  * the idempotence mechanism. A batch replayed after a crash finds
  * its keys already in the corpus and admits nothing — the replayed
  * append is an EMPTY append. The only window that matters is a crash
  * between the parquet job commit and the checkpoint commit, which is
  * exactly the replay case above; uncommitted task files from a crash
  * mid-write live under `_temporary` and are invisible to the read
  * path (Spark's file listing skips `_`/`.` paths). Contrast with the
  * reference's blind append (streaming-longtime.py:124-142), which
  * duplicates on every replay.
  *
  * Scale posture: per batch, the corpus side is ONE count (parquet
  * metadata) + one Bloom build over corpus keys. At 100 TB the Bloom
  * build itself should not rescan the corpus per trigger — maintain
  * the filter incrementally (`BloomFilter.mergeInPlace` of the
  * admitted rows' filter, kept on the driver or in the checkpoint)
  * or persist the fingerprint index bucketed (`Routing.writeBucketed`)
  * so the confirm join is corpus-shuffle-free; both are the same
  * tiering, built here from the corpus frame for self-containment.
  */
object DedupIngest {

  /** Admit one batch into the corpus directory (also usable from a
    * caller's own foreachBatch). Returns the number of admitted rows.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                 key: String, tiebreaker: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusDir), spark.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(new org.apache.hadoop.fs.Path(corpusDir))
    val admitted =
      if (bootstrap) Dedup.exactKeepFirst(batch, Seq(key), tiebreaker)
      else Dedup.incrementalExact(
        spark.read.parquet(corpusDir), batch, key, tiebreaker)
    // the admitted set is needed twice (count to skip empty appends,
    // then the write); persist the BATCH-sized result so the second
    // action does not re-run the confirm join's corpus scan
    admitted.persist()
    try {
      val n = admitted.count()
      if (n > 0)
        admitted.write.mode(SaveMode.Append).parquet(corpusDir)
      n
    } finally admitted.unpersist()
  }

  /** Resident stream: checkpointed foreachBatch admitting every
    * micro-batch through [[admitBatch]].
    */
  def start(stream: DataFrame, corpusDir: String, checkpointDir: String,
            key: String, tiebreaker: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch.sparkSession, batch, corpusDir, key, tiebreaker)
        ()
      }
      .start()
}
