package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (100 TB posture). AQE's skew-join split handles
  * sort-merge skew at runtime; explicit salting remains the tool when
  * a handful of keys dominate a shuffle join so badly that even split
  * partitions bottleneck, or when the engine must pre-commit a layout.
  */
object Skew {

  /** Salted equi-join of a skewed `large` side against `small`:
    * the large side gets a per-row salt in [0, salts), the small side
    * is replicated once per salt, and the join key becomes
    * (key, salt) — a hot key's rows spread over `salts` partitions
    * instead of one. Semantics identical to
    * `large.join(small, keys)` for 1:N joins (small's key unique).
    *
    * The join is PINNED to sort-merge. Salting only exists once
    * broadcast has been ruled out — a broadcast join has no shuffle
    * and therefore no skew — so letting Catalyst pick is strictly
    * wrong here: its pre-explode size estimate can choose
    * BroadcastHashJoin on the ×salts replicated dim, which builds
    * salts× the driver table for zero benefit (measured: driver
    * broadcast OOM at sf25, where 3.75M customers × 16 salts = 60M
    * broadcast rows — caught by the r7 sweep). Shuffle-hash was tried
    * and rejected: its per-task build (|small|·salts/parts rows) is
    * NOT spill-safe and overflowed the task memory budget at the same
    * scale ("not enough memory to build hash map") — exactly the
    * failure mode a salted operator sized for unknown-skew inputs
    * must not have. Sort-merge spills both sides; the salt still
    * spreads the hot key over `salts` sorted partitions.
    *
    * Cost model: small side × salts shuffles and sorts once — use for
    * dim-joins with hot fact keys, not fact–fact (there, AQE's skew
    * split is the tool).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated.hint("merge"), keys :+ "_salt").drop("_salt")
  }

  /** Two-phase salted aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Spark's map-side partial aggregation
    * already gives this for algebraic aggs; the explicit form matters
    * for high-cardinality combiners (collect-like, sketches) where one
    * hot key would funnel into a single reducer.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
