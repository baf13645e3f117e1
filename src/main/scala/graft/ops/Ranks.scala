package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking over LOW-CARDINALITY window partitions.
  *
  * Spark's Window operator gives one task per partition-by group: a
  * rank suite partitioned on a 5-value column runs at parallelism 5
  * no matter the cluster — at sf25 each task sorted 7.5M rows and
  * `win_rank_suite` was the bench's worst remaining scaler (28 s,
  * exp 1.00). The classic fix is two-level ranking: bucket the order
  * value into contiguous ranges, rank LOCALLY within (group, bucket)
  * — parallelism = groups × buckets — then add per-bucket prefix
  * offsets computed on the tiny (groups × buckets) count table. Every
  * step is a DataFrame op (no mapPartitions), so Catalyst/AQE still
  * see the whole plan.
  *
  * Requires a TOTAL order: (orderCol, tieCol) unique per row (the
  * tiebreak a deterministic oracle needs anyway). Under a total order
  * every row is its own peer group, so rank == dense_rank ==
  * row_number, percent_rank = (rn−1)/(n−1) and cume_dist = rn/n are
  * exact, and ntile follows from (rn, n) alone.
  *
  * Bucket boundaries are a LINEAR split of [min, max] per the whole
  * input (width_bucket) — deterministic and layout-independent, no
  * sketch merge order in sight (approx_percentile boundaries would
  * depend on partition merge order). Skewed value distributions only
  * cost balance, never correctness; ties on the order value land in
  * one bucket only if they share the exact double, which a boundary
  * split preserves (width_bucket is a pure function of the value).
  *
  * Output columns: `drnk` (bigint, == row_number under the total
  * order), `quartile` (bigint ntile(`ntiles`)), `prnk`, `cdist`
  * (doubles) — the `win_rank_suite` surface.
  *
  * SIZE-SWITCHED: below [[smallRowThreshold]] rows the per-group sort
  * fits one task comfortably and the two-level machinery (bucket
  * column, offset join) only adds constant cost — there the suite is
  * a single plain Window, value-identical by the total-order argument
  * above. The row count comes from the same one-column range
  * aggregate that validates the null/NaN precondition, so the switch
  * costs no extra job. At sf0.1 the switch returns the entry to plain
  * Window speed (~0.4 s); at sf25 it keeps the two-level 7.6 s plan.
  */
object Ranks {

  /** Below this many input rows, a plain Window wins: with ≤2M rows a
    * 5-group partition-by sorts ≤400k rows per task — milliseconds —
    * while the two-level path pays a bucket column, a group-by, and a
    * broadcast join regardless of size. Above it, Window parallelism
    * (== group cardinality) becomes the bottleneck and two-level
    * ranking takes over.
    */
  val smallRowThreshold: Long = 2L * 1000 * 1000

  def totalOrderRankSuite(df: DataFrame, partCols: Seq[String],
                          orderCol: String, tieCol: String,
                          ntiles: Int = 4, desc: Boolean = true,
                          buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions * 4
    val part = partCols.map(col)
    // one tiny agg for the global value range, the row count driving
    // the size switch, and the precondition counts. Null AND NaN order
    // values are refused loudly: width_bucket(null) silently drops
    // rows, and a single NaN poisons max() (Spark sorts NaN greatest)
    // so hi=NaN makes width_bucket return null for EVERY row — the
    // same silent-drop failure, one step removed.
    val r = df.agg(min(col(orderCol).cast("double")).as("lo"),
        max(col(orderCol).cast("double")).as("hi"),
        sum(when(col(orderCol).isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when(isnan(col(orderCol).cast("double")), 1L).otherwise(0L)).as("nans"),
        count(lit(1)).as("n"))
      .head()
    val ord: Seq[Column] =
      if (desc) Seq(col(orderCol).desc, col(tieCol)) else Seq(col(orderCol), col(tieCol))
    if (r.getLong(4) == 0L) {
      // empty input: the lo/hi/nulls slots are all null — emit the
      // four output columns with their contract types instead of
      // letting getLong NPE on a degenerate-but-legal input
      return df.withColumn("drnk", lit(null).cast("long"))
        .withColumn("quartile", lit(null).cast("long"))
        .withColumn("prnk", lit(null).cast("double"))
        .withColumn("cdist", lit(null).cast("double"))
    }
    require(r.getLong(2) == 0L,
      s"totalOrderRankSuite: $orderCol has null values — a rank over them " +
        "is order-undefined; filter or coalesce first")
    require(r.getLong(3) == 0L,
      s"totalOrderRankSuite: $orderCol has NaN values — NaN poisons the " +
        "bucket range (max()=NaN ⇒ width_bucket=null ⇒ silent row drops); " +
        "filter or coalesce first")
    // explicit `buckets` is an explicit two-level request (specs pin
    // the two-level path on small data this way); the size switch
    // applies only to the default call
    if (buckets == 0 && r.getLong(4) <= smallRowThreshold) {
      // row_number-BASED on purpose, not dense_rank/percent_rank/
      // cume_dist: the two-level path below derives every output from
      // the global row number, and the built-ins only coincide with
      // that construction when (orderCol, tieCol) is a STRICT total
      // order. Nothing enforces that uniqueness, so an input with
      // duplicate (order, tie) pairs must not change answers depending
      // on which side of the size switch it lands — both paths now
      // compute the identical rn-based arithmetic (ntile already is).
      val w = Window.partitionBy(part: _*).orderBy(ord: _*)
      val wn = Window.partitionBy(part: _*)
      return df
        .withColumn("_rn", row_number().over(w).cast("long"))
        .withColumn("_n", count(lit(1)).over(wn))
        .withColumn("drnk", col("_rn"))
        .withColumn("quartile", ntile(ntiles).over(w).cast("long"))
        .withColumn("prnk",
          when(col("_n") === 1L, 0.0)
            .otherwise((col("_rn") - 1L).cast("double") / (col("_n") - 1L)))
        .withColumn("cdist", col("_rn").cast("double") / col("_n"))
        .drop("_rn", "_n")
    }
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    // ascending bucket id follows the REQUESTED order direction, so
    // the prefix walk below is a plain ascending window
    val rawB =
      if (hi == lo) lit(1)
      else width_bucket(col(orderCol).cast("double"), lit(lo), lit(hi), lit(nb))
    val bid = (if (desc) lit(nb.toLong + 2) - rawB else rawB).as("_bid")

    val bucketed = df.withColumn("_bid", bid)
    // local rank: parallelism = |partCols distinct| × nb
    val wLocal = Window.partitionBy((part :+ col("_bid")): _*).orderBy(ord: _*)
    val local = bucketed.withColumn("_lrn", row_number().over(wLocal).cast("long"))
    // prefix offsets on the (groups × buckets) count table — tiny by
    // construction, broadcast back
    val wPrefix = Window.partitionBy(part: _*).orderBy(col("_bid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.partitionBy(part: _*)
    val offsets = bucketed.groupBy((part :+ col("_bid")): _*)
      .agg(count(lit(1)).as("_bn"))
      .select((part :+ col("_bid") :+
        coalesce(sum(col("_bn")).over(wPrefix), lit(0L)).as("_off") :+
        sum(col("_bn")).over(wTotal).as("_n")): _*)

    val rn = (col("_off") + col("_lrn")).as("_rn")
    val joined = local.join(broadcast(offsets), partCols :+ "_bid")
      .withColumn("_rn", rn)
    // Spark/ANSI ntile: n = sz·ntiles + rem ⇒ first `rem` tiles carry
    // sz+1 rows. Spark's `/` on integers is DOUBLE division — floor
    // explicitly for the integral tile arithmetic.
    val sz = floor(col("_n") / ntiles).cast("long")
    val rem = (col("_n") % ntiles).cast("long")
    val cut = rem * (sz + 1L)
    val tile = when(col("_n") < ntiles, col("_rn")) // degenerate: one row per tile
      .otherwise(when(col("_rn") <= cut,
          floor((col("_rn") - 1L) / (sz + 1L)).cast("long") + 1L)
        .otherwise(least(lit(ntiles.toLong),
          rem + floor((col("_rn") - cut - 1L) / sz).cast("long") + 1L)))
    joined
      .withColumn("drnk", col("_rn"))
      .withColumn("quartile", tile.cast("long"))
      .withColumn("prnk",
        when(col("_n") === 1L, 0.0)
          .otherwise((col("_rn") - 1L).cast("double") / (col("_n") - 1L)))
      .withColumn("cdist", col("_rn").cast("double") / col("_n"))
      .drop("_bid", "_lrn", "_off", "_n", "_rn")
  }

  /** Distributed GLOBAL running sum under a total order — the same
    * two-level construction as [[totalOrderRankSuite]] with COUNT
    * generalized to SUM(weight): a plain `sum().over(Window.orderBy)`
    * with no partition-by is ONE task at any cluster size, while this
    * form sums locally per contiguous order-range bucket and adds the
    * tiny per-bucket prefix totals back by broadcast. The workhorse
    * behind token-budget sampling ("take the first N tokens of the
    * corpus in epoch order"): admit while the EXCLUSIVE prefix is
    * under budget.
    *
    * Adds `run_sum` (long, inclusive cumulative sum of `weightCol` in
    * ascending (orderCol, tieCol) order, per `partCols` group — empty
    * partCols = one global order, the token-budget shape; a
    * low-cardinality partCols (per-source packing) hits the same
    * one-task-per-group wall and gets groups × buckets parallelism
    * here). Weights are cast to long — integral weights (token/byte
    * counts) keep the arithmetic exact and cross-engine comparable.
    * Same preconditions as the rank suite (null/NaN order values
    * refused loudly; null weights refused — sum() would silently skip
    * them and every later prefix would be wrong), same size switch
    * (plain Window below [[smallRowThreshold]] rows, two-level above,
    * `buckets > 0` forces two-level for spec pinning).
    */
  def totalOrderRunningSum(df: DataFrame, partCols: Seq[String],
                           orderCol: String, tieCol: String,
                           weightCol: String, buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions * 4
    val part = partCols.map(col)
    val w = col(weightCol).cast("long")
    val r = df.agg(min(col(orderCol).cast("double")).as("lo"),
        max(col(orderCol).cast("double")).as("hi"),
        sum(when(col(orderCol).isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when(isnan(col(orderCol).cast("double")), 1L).otherwise(0L)).as("nans"),
        sum(when(w.isNull, 1L).otherwise(0L)).as("wnulls"),
        count(lit(1)).as("n"))
      .head()
    if (r.getLong(5) == 0L)
      return df.withColumn("run_sum", lit(null).cast("long"))
    require(r.getLong(2) == 0L,
      s"totalOrderRunningSum: $orderCol has null values — the order is " +
        "undefined; filter or coalesce first")
    require(r.getLong(3) == 0L,
      s"totalOrderRunningSum: $orderCol has NaN values — NaN poisons the " +
        "bucket range; filter or coalesce first")
    require(r.getLong(4) == 0L,
      s"totalOrderRunningSum: $weightCol has null values — sum() would " +
        "silently skip them and every later prefix would be wrong")
    val ord = Seq(col(orderCol), col(tieCol))
    if (buckets == 0 && r.getLong(5) <= smallRowThreshold)
      return df.withColumn("run_sum",
        sum(w).over(Window.partitionBy(part: _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    // bucket boundaries from the GLOBAL order-value range (one range
    // agg, not one per group): per-group ranges would be tighter but
    // cost a groups-sized pre-pass; balance only affects speed, never
    // correctness (see the rank suite's boundary note)
    val bid =
      (if (hi == lo) lit(1)
       else width_bucket(col(orderCol).cast("double"), lit(lo), lit(hi), lit(nb)))
        .as("_bid")
    val bucketed = df.withColumn("_bid", bid)
    val wLocal = Window.partitionBy((part :+ col("_bid")): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("_lrun", sum(w).over(wLocal))
    val wPrefix = Window.partitionBy(part: _*).orderBy(col("_bid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy((part :+ col("_bid")): _*)
      .agg(sum(w).as("_bw"))
      .select((part :+ col("_bid") :+
        coalesce(sum(col("_bw")).over(wPrefix), lit(0L)).as("_off")): _*)
    local.join(broadcast(offsets), partCols :+ "_bid")
      .withColumn("run_sum", col("_off") + col("_lrun"))
      .drop("_bid", "_lrun", "_off")
  }

}
