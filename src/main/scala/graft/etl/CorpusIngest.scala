package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.CorpusPipeline

/** The STREAMING training-corpus builder — `ops.CorpusPipeline`'s
  * stages running as a resident ingest: every micro-batch passes the
  * quality gate, is decontaminated against a FIXED held-out set, and
  * is admitted against the growing corpus through
  * [[DedupIngest.admitBatch]]'s bloom-tiered exact dedup. This is the
  * composed shape a production corpus runs CONTINUOUSLY (the batch
  * `prep` is its backfill twin): cleaning and decontamination are
  * batch-local projections/aggregations, the only cross-batch state
  * is the corpus itself, and exactly-once is admission-idempotence
  * (a replayed batch finds its keys present and appends nothing —
  * the argument in [[DedupIngest.admitBatch]]'s doc).
  *
  * The decontaminator (held-out shingle set + Bloom) is built ONCE at
  * stream start — an eval benchmark is fixed while a stream runs; a
  * benchmark refresh is a stream restart with a new instance. Output
  * corpus rows keep `text` (the admission key for future batches)
  * plus (lang, source, n_tok, split).
  */
object CorpusIngest {

  /** Admit one micro-batch through quality → decontamination → dedup.
    * Returns the number of admitted rows. `deco` comes from
    * `CorpusPipeline.Decontaminator.build(benchDocs)` — pass the same
    * instance for every batch of a stream.
    */
  private[graft] def admitBatch(batch: DataFrame,
                                deco: CorpusPipeline.Decontaminator,
                                corpusDir: String): Long = {
    val gated = batch.join(CorpusPipeline.qualityKeep(batch), "doc_id")
    val clean = deco.clean(gated, carryCols = Seq("text", "lang", "source", "n_tok"))
      .withColumn("split", CorpusPipeline.splitCol)
    DedupIngest.admitBatch(batch.sparkSession, clean, corpusDir,
      key = "text", tiebreaker = "doc_id")
  }

  /** Resident stream: checkpointed foreachBatch over [[admitBatch]].
    * `benchDocs` is a BATCH frame (the held-out set), read once.
    */
  def start(stream: DataFrame, benchDocs: DataFrame, corpusDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val deco = CorpusPipeline.Decontaminator.build(benchDocs, persistBench = true)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, deco, corpusDir)
        ()
      }
      .start()
  }
}
