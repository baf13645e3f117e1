package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization. The reference ships a full
  * Debezium connector config for exactly this feed
  * (/root/reference/config/debezium/conf.json — wired in
  * docker-compose but never enabled), so the changelog-apply step is
  * part of its intended surface: turn an append-only stream of keyed
  * upsert/delete operations into the current snapshot.
  *
  * Scale shape: `applyLatest` is ONE aggregation — `max_by` over a
  * total-order sequence key keeps a single row per key in the
  * map-side partials, so the shuffle carries |keys| rows, not
  * |changes| (hash-aggregated for fixed-width payloads; string
  * payloads fall back to sort-based agg with the same partial-agg
  * shape). No window sort, no self-join. (The window-function
  * formulation — row_number desc = 1 — shuffles and sorts every
  * change row; at 100 TB of changelog that is the difference between
  * a merge-sized job and a full re-sort.)
  */
object Cdc {

  /** Latest-wins apply: keep each key's highest-`seq` change, drop the
    * key when that change is a delete. `seq` must be a total order
    * (unique per key); `payload` columns ride along via max_by.
    */
  def applyLatest(changes: DataFrame, key: Column, seq: Column, op: Column,
                  deleteOp: String, payload: Seq[(String, Column)]): DataFrame = {
    val picked = changes.groupBy(key.as("k")).agg(
      max(seq).as("last_seq"),
      max_by(op, seq).as("_op") +:
        payload.map { case (n, c) => max_by(c, seq).as(n) }: _*)
    picked.filter(col("_op") =!= deleteOp).drop("_op")
  }

  /** Slowly-changing-dimension type 2: collapse an ordered change
    * history to validity intervals of `attr`, one row per run of equal
    * values — `[eff_from, eff_to)`, open-ended (null eff_to) for the
    * current row, versions numbered per key.
    *
    * Two window passes over the same (key → ord) shuffle: change
    * detection (lag) then interval close (lead) + version number —
    * Catalyst reuses one Exchange/Sort for all three functions.
    */
  def scd2(history: DataFrame, key: Column, ord: Seq[Column],
           attr: Column, effTime: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val changed = history
      .withColumn("_prev", lag(attr, 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= attr)
    val kw = Window.partitionBy(key).orderBy(ord: _*)
    changed.select(
      key.as("k"),
      attr.as("attr"),
      effTime.as("eff_from"),
      lead(effTime, 1).over(kw).as("eff_to"),
      row_number().over(kw).cast("long").as("version"),
      lead(effTime, 1).over(kw).isNull.as("is_current"))
  }
}
