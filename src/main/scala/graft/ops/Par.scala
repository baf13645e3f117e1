package graft.ops

import org.apache.spark.sql.DataFrame

/** Stream-side parallelism guard for broadcast-join pipelines.
  *
  * Under a broadcast join, parallelism is exactly the STREAM side's
  * partition count — and a small input (one parquet split) serializes
  * the whole downstream enumeration/expansion onto one core no matter
  * how many the machine has. [[spread]] round-robin repartitions to
  * the session's shuffle parallelism when (and only when) the plan is
  * narrower: a no-op for real-scale inputs that already scan wide, an
  * order-of-magnitude win on bench-sized files (measured: similarity
  * scoring 8.4→0.7 s, fuzzy-join expansion 85→? s — see call sites).
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
