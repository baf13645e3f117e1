package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Similarity

/** Streaming maintenance of a persisted ANN index
  * ([[graft.ops.Similarity.buildIvfPqIndex]]): each micro-batch of
  * new vectors is appended with the FROZEN persisted model —
  * O(batch) per trigger, the index data files are never read — so a
  * 100 TB index keeps serving queries while ingest runs forever and
  * the quantizer refit stays a deliberate, offline act.
  *
  * EXACTLY-ONCE BY CONSTRUCTION, the [[DedupIngest]] shape: every
  * batch writes under segment `runTag-batchId` (runTag = hash of the
  * checkpoint path — stable across resume, distinct across fresh
  * checkpoints), and the append is a dynamic partition OVERWRITE of
  * exactly the (seg, cell) partitions the batch produces. Cell
  * assignment is deterministic given the persisted centroids, so a
  * crash-replay of the same batch id recomputes identical partitions
  * and overwrites itself in place; no admission state, no manifest,
  * nothing to repair.
  *
  * The caller owns dedup and batching policy upstream: route the
  * stream through [[DedupIngest.startEmbeddingDedup]] first if
  * near-duplicate vectors must not enter the index, and size
  * triggers so batches amortize the one-file-per-touched-cell commit
  * (SCALE.md's accumulate-to-≳100·nlist-rows policy).
  */
object IndexIngest {

  /** One batch of the maintenance stream — exposed so tests (and
    * manual backfills that want streaming semantics) can drive the
    * exact code path the query runs, including a crash-replay under
    * the same batch id.
    */
  def appendBatch(batch: DataFrame, indexDir: String, checkpointDir: String,
                  batchId: Long): Unit =
    Similarity.appendToIvfPqIndex(batch.sparkSession, indexDir, batch,
      seg = Some(s"${runTagOf(checkpointDir)}-$batchId"))

  /** Resident maintenance stream: `stream` must carry the index
    * schema (`vec_id`, `embedding`). The index must already exist
    * ([[graft.ops.Similarity.buildIvfPqIndex]] — possibly over an
    * empty corpus sample is NOT supported: the frozen model is the
    * contract, so bootstrap fits it).
    */
  def startIvfPqAppend(stream: DataFrame, indexDir: String,
                       checkpointDir: String,
                       trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, indexDir, checkpointDir, batchId)
      }
      .start()

  /** Run tag = checkpoint identity, the [[DedupIngest]] rule: stable
    * across resume of the same checkpoint (replays land on their own
    * segments), distinct across fresh checkpoints (a new run's batch
    * 0 never overwrites an old run's batch 0 — old segments stay as
    * ordinary corpus content, which is correct: the rows ARE in the
    * index).
    */
  private def runTagOf(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
}
