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

  /** True iff `dir` holds at least one COMMITTED data file. Directory
    * existence alone is the wrong bootstrap signal: a crash mid-write
    * leaves the directory created with only `_temporary`/staging
    * content, and a replay that trusted `fs.exists` would try to read
    * an empty parquet dir and fail permanently instead of
    * re-admitting. Hidden entries (`_`/`.` prefixes — Spark's own
    * read-path convention) are skipped at every level.
    */
  private def hasCommittedData(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String): Boolean = {
    // Spark's own hidden-path rule: `_`/`.` prefixes are skipped
    // EXCEPT names containing "=" (partition directories like
    // `_ingest_batch=0` must stay visible)
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      val n = p.getName
      !(n.startsWith("_") && !n.contains("=")) && !n.startsWith(".")
    }
    def scan(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        visible(st.getPath) &&
          (if (st.isDirectory) scan(st.getPath) else st.getLen > 0)
      }
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && scan(p)
  }

  /** Admit one batch into the corpus directory (also usable from a
    * caller's own foreachBatch). Returns the number of admitted rows.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame, corpusDir: String,
                 key: String, tiebreaker: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusDir), spark.sparkContext.hadoopConfiguration)
    val bootstrap = !hasCommittedData(fs, corpusDir)
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

  // ---------------------------------------------------------------- //
  // NEAR-dup admission (MinHash-banded)                              //
  // ---------------------------------------------------------------- //

  /** Admit one batch with NEAR-duplicate rejection: a batch doc is
    * admitted iff it is (a) not a near-dup (MinHash-LSH candidate +
    * exact Jaccard ≥ threshold) of any doc admitted by an EARLIER
    * batch, and (b) not a near-dup of ANY lower-`idCol` doc that
    * survived (a) from the same batch — the keep-first rule every
    * dedup surface here uses (`Dedup.semanticDedup`'s verdict form):
    * a chain A~B~C with A≁C keeps only A, because C's lower near-dup
    * B needs no admission of its own to disqualify C (exact dups
    * included — Jaccard(x, x) = 1; group-transitive closure is
    * `Dedup.connectedComponentsStar`'s job when cluster semantics
    * matter).
    *
    * State: the corpus docs and a PERSISTED BAND INDEX (`<dir>_bands`:
    * doc id, band, key, shingle code set), both PARTITIONED BY the
    * ingest batch id. Each batch probes the index with a band
    * equi-join sized by the BATCH's bands — corpus text is never
    * rescanned (at 100 TB the index is the bucketed table the batch
    * join co-partitions against).
    *
    * Exactly-once under crash/replay — and NOT by admission alone:
    * with two state stores, append-on-admit has a crash window either
    * way around (docs landed + bands missing ⇒ replay re-admits and
    * duplicates; bands landed + docs missing ⇒ replay self-rejects
    * and LOSES the batch). Instead both writes are per-batch
    * PARTITION OVERWRITES keyed by `batchId`, and the probe EXCLUDES
    * the batch's own partition: a replay recomputes the identical
    * admission decision (prior-batch state cannot have changed) and
    * overwrites its own two partitions — idempotent at any crash
    * point. Returns the admitted count.
    */
  def admitBatchNearDup(spark: SparkSession, batch: DataFrame, corpusDir: String,
                        batchId: Long, idCol: String, textCol: String,
                        threshold: Double = 0.7, k: Int = 64, bands: Int = 16,
                        shingleSize: Int = 3, seed: Long = 42L): Long = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.functions._
    import graft.functions.{JaccardSortedExpr, MinHashBandsExpr, ShingleCodesExpr}
    val bandsDir = corpusDir.stripSuffix("/") + "_bands"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusDir), spark.sparkContext.hadoopConfiguration)
    val bootstrap = !hasCommittedData(fs, bandsDir)

    val b = batch
      .withColumn("_sh", toCol(ShingleCodesExpr(toExpr(col(textCol)),
        shingleSize, distinct = true)))
      .withColumn("_bands", toCol(MinHashBandsExpr(toExpr(col(textCol)),
        k, bands, shingleSize, seed)))
      .persist()
    try {
      // (1) near-dups vs batches admitted BEFORE this one: band-join
      // the persisted index (own partition excluded — replay safety),
      // verify with exact Jaccard over the stored code sets
      val corpusDups: DataFrame =
        if (bootstrap) b.select(col(idCol)).limit(0)
        else {
          val idx = spark.read.parquet(bandsDir)
            .filter(col("_ingest_batch") =!= batchId)
          b.select(col(idCol), col("_sh"),
              posexplode(col("_bands")).as(Seq("_band", "_key")))
            .join(idx, Seq("_band", "_key"))
            .filter(toCol(JaccardSortedExpr(toExpr(col("_sh")),
              toExpr(col("_c_sh")))) >= threshold)
            .select(col(idCol)).distinct()
        }
      val survivors = b.join(corpusDups, Seq(idCol), "left_anti")
      // (2) keep-first within the batch: drop any survivor near-dup of
      // a lower-id survivor (exact dups collide in every band)
      val bandRows = survivors.select(col(idCol), col("_sh"),
        posexplode(col("_bands")).as(Seq("_band", "_key")))
      val inBatchDrops = bandRows.alias("l")
        .join(bandRows.alias("r"),
          col("l._band") === col("r._band") && col("l._key") === col("r._key") &&
            col(s"l.$idCol") < col(s"r.$idCol"))
        .filter(toCol(JaccardSortedExpr(toExpr(col("l._sh")),
          toExpr(col("r._sh")))) >= threshold)
        .select(col(s"r.$idCol").as(idCol)).distinct()
      val admitted = survivors.join(inBatchDrops, Seq(idCol), "left_anti").persist()
      try {
        val n = admitted.count()
        if (n > 0) {
          admitted.drop("_sh", "_bands")
            .withColumn("_ingest_batch", lit(batchId))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_batch").parquet(corpusDir)
          // the admitted docs' bands + code sets extend the index —
          // the ONLY state future batches probe
          admitted.select(col(idCol).as("_c_id"), col("_sh").as("_c_sh"),
              posexplode(col("_bands")).as(Seq("_band", "_key")))
            .withColumn("_ingest_batch", lit(batchId))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_batch").parquet(bandsDir)
        }
        n
      } finally admitted.unpersist()
    } finally b.unpersist()
  }

  /** Resident stream for [[admitBatchNearDup]]. */
  def startNearDup(stream: DataFrame, corpusDir: String, checkpointDir: String,
                   idCol: String, textCol: String, threshold: Double = 0.7,
                   trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatchNearDup(batch.sparkSession, batch, corpusDir, batchId,
          idCol, textCol, threshold)
        ()
      }
      .start()
}
