package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink-side routing (reference §2.2).
  *
  * The reference fans a micro-batch out to per-(coin, interval)
  * destinations with `distinct().collect()` + a driver loop that
  * re-filters the batch once per group — O(groups) Spark jobs per
  * batch (/root/reference/spark/streaming-longtime.py:119-142,
  * SURVEY.md §4.2). Here the same routing is ONE dynamic-partition
  * write: every executor writes its own partition files for all keys
  * it holds, one job regardless of group count.
  */
object Routing {

  /** The reference's destination-name mangling
    * (streaming-longtime.py:124-125): `source_{coin}_db` /
    * `table_{interval}`, lower-cased. A Python None coin would have
    * produced the literal db name `source_none_db` there; here null
    * keys are handled by the partition layer instead (see
    * [[writePartitioned]]).
    */
  def destName(coin: String, interval: String): (String, String) =
    (s"source_${String.valueOf(coin).toLowerCase}_db",
     s"table_${String.valueOf(interval).toLowerCase}")

  /** Dynamic-partition append: `path/coin=X/interval=Y/part-*.parquet`.
    * Equivalent of the reference's per-(db, table) JDBC routing, with
    * partition pruning for free on read-back.
    *
    * Null routing keys (possible: the wire schema is fully nullable,
    * SURVEY §1.2/§7.4) land in the hive default partition
    * (`coin=__HIVE_DEFAULT_PARTITION__`) and read back as null —
    * pinned in `StreamingSpec` — rather than minting a fake
    * `source_none_db` destination like the reference would.
    */
  def writePartitioned(df: DataFrame, path: String,
                       keys: Seq[String] = Seq("coin", "interval")): Unit =
    df.write.mode(SaveMode.Append).partitionBy(keys: _*).parquet(path)

  /** Small-file compaction: streaming appends leave one file per
    * micro-batch per partition; at scale the file count, not the
    * bytes, kills scan planning. Re-writes `path` into
    * ceil(totalBytes / targetFileBytes) files, sized from the scan's
    * own `_metadata.file_size` (no filesystem listing pass). Write to
    * a fresh directory then swap — an object store would commit via
    * rename/manifest; the read-back-equality contract is pinned in
    * `AvroSinkSpec`.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(path)
    val totalBytes = df
      .select(org.apache.spark.sql.functions.col("_metadata.file_path").as("f"),
        org.apache.spark.sql.functions.col("_metadata.file_size").as("sz"))
      .dropDuplicates("f")
      .agg(org.apache.spark.sql.functions.sum("sz")).head().getLong(0)
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = path.stripSuffix("/") + "._compact_tmp"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    nFiles
  }

  /** Streaming form: checkpointed foreachBatch that routes each
    * micro-batch with one partitioned write (sink_foreach_batch +
    * sink_jdbc_append semantics, minus the per-group job storm).
    * Caller starts it: `routedParquet(ds, path, cp).start()`.
    */
  def routedParquet(enriched: DataFrame, path: String, checkpointDir: String,
                    keys: Seq[String] = Seq("coin", "interval"))
      : DataStreamWriter[Row] =
    enriched.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) writePartitioned(batch, path, keys)
      }
      .trigger(Trigger.AvailableNow())

  /** Bucketed table write: co-locates rows by hash(key) % buckets so
    * joins/aggregations between tables bucketed the same way need NO
    * shuffle (plan shows zero Exchange). At 100 TB this is the
    * pre-partitioning discipline for recurring fact–fact joins: pay
    * one shuffle at load time, reuse the layout across every query.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 8, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** The reference's DDL-ensure + JDBC append
    * (streaming-longtime.py:69-106,134-142): plain `java.sql` on the
    * driver for DDL (no Spark primitive exists), executor-parallel
    * JDBC append for data. Kept API-compatible; exercised only where
    * a database is reachable.
    */
  def ensureTableAndAppend(df: DataFrame, jdbcUrl: String, table: String,
                           ddl: String, props: java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
    try {
      // dialect-neutral IF NOT EXISTS: probe the catalog first
      // (Derby has no IF NOT EXISTS; PostgreSQL/MySQL do)
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var exists = false
      while (rs.next() && !exists)
        exists = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      if (!exists)
        conn.createStatement().execute(s"CREATE TABLE $table ($ddl)")
    } finally conn.close()
    df.write.mode(SaveMode.Append).jdbc(jdbcUrl, table, props)
  }
}
