package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.ingest.KlineIngest
import graft.sinks.Routing

/** The reference's jobs as single compositions — what a user of
  * JulienDira/big-data-streaming runs after switching engines.
  *
  * `streaming-longtime.py` ≙ [[longtime]]: Kafka-shaped stream →
  * parse → enrich → keyed dedup (upgrade: the reference stores the
  * duplicates) → one partitioned routed write per micro-batch,
  * checkpointed (upgrade: the reference has no checkpoint and runs
  * O(groups) jobs per batch).
  *
  * `streaming-shorttime.py` ≙ the same with the Avro archive sink
  * (`sinks.AvroSink`) in the foreachBatch body.
  * `streaming-longtime-raw.py` ≙ `etl.IncrementalEtl`.
  */
object KlinePipeline {

  /** Build the transform side (stream or batch frame in, enriched
    * deduplicated frame out). */
  def enriched(kafkaShaped: DataFrame, dedup: Boolean = true): DataFrame = {
    val e = KlineIngest.enrich(KlineIngest.parse(kafkaShaped))
    if (dedup) KlineIngest.dedupStream(e) else e
  }

  /** Full long-time job: returns the ready-to-`start()` writer. */
  def longtime(kafkaShaped: DataFrame, outPath: String,
               checkpointDir: String): DataStreamWriter[Row] =
    Routing.routedParquet(enriched(kafkaShaped), outPath, checkpointDir)
}
