package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting a table by ONE key gives perfect min/max pruning on that
  * key and none on any other; interleaving the bits of two keys gives
  * useful pruning on BOTH — each parquet file covers a small rectangle
  * of the (a, b) space, so a predicate on either dimension skips most
  * files via footer statistics alone. This is the standard layout
  * technique for 100 TB fact tables queried along multiple axes
  * (time × key, part × supplier, …).
  *
  * The bit interleave is the classic mask-spread: 5 shift/mask steps
  * per dimension, all built-in `shiftleft`/`bitwiseAND`/`bitwiseOR`
  * expressions — whole-stage codegen, deterministic, and replicable
  * verbatim in the DuckDB oracle (`etl_zorder` states the identical
  * arithmetic in SQL).
  *
  * Inputs are clamped to 16 bits here (fixture keys fit); a cluster
  * deployment first range-bins each dimension to 16-bit ranks via
  * `ntile`/quantile bounds — the interleave is unchanged.
  */
object Layout {

  /** Spread the low 16 bits of `c` so consecutive input bits land two
    * apart: 0b1111 → 0b01010101. */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (a in even bits). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` clustered by the z-value of (a, b): range-partition on
    * z (one task per output file, balanced by sampling) and sort
    * within partitions, so every file covers one compact z-interval —
    * a rectangle-ish region of (a, b) space with tight min/max footer
    * stats on BOTH columns.
    *
    * Each dimension is first normalized to the full 16-bit range with
    * `width_bucket` over its actual min/max (one tiny agg, 4 scalars
    * to the driver). Without this, a dimension with fewer significant
    * bits never reaches the high interleave positions and the split
    * degenerates to a single-key sort — with it, consecutive z-range
    * cuts alternate between the dimensions regardless of their raw
    * scales. (Skewed deployments swap the uniform bins for
    * approx-quantile bounds at the same call site.)
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  files: Int = 8): Unit = {
    val r = df.agg(min(a).cast("double"), max(a).cast("double"),
      min(b).cast("double"), max(b).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) { // empty (or all-null-key) input:
      df.write.mode("overwrite").parquet(path) // write it as-is, no layout
      return
    }
    def bin(c: Column, lo: Double, hi: Double): Column =
      if (lo >= hi) lit(0L)
      else least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(65536)),
        lit(65536L)) - 1L
    df.withColumn("_z", zValue(
        bin(a, r.getDouble(0), r.getDouble(1)),
        bin(b, r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Mean per-file span (max-min) of `c` over a parquet directory —
    * the pruning-power metric: lower span ⇒ a point/range predicate on
    * `c` overlaps fewer files. */
  def meanFileSpan(df: DataFrame, c: String): Double = {
    val spans = df.groupBy(input_file_name()).agg(
      (max(col(c)) - min(col(c))).cast("double").as("span"))
    spans.agg(avg(col("span"))).head().getDouble(0)
  }
}
