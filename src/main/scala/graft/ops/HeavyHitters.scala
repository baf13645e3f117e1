package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequent-items (heavy hitters) via a Misra–Gries
  * summary: at most `k - 1` (token, count) pairs of state, one pass,
  * mergeable — the streaming/partial-agg shape Spark's partial→final
  * aggregation wants. Guarantees (Misra–Gries 1982; merge bound from
  * the mergeable-summaries line of work): estimates never overcount,
  * undercount by at most n/k total, hence EVERY item with true
  * frequency > n/k survives the sketch. At 100 TB this replaces an
  * exact token count whose group-by state is the vocabulary (billions
  * of keys) with O(k) state per partial — the same
  * fixed-size-mergeable-state pattern as the HLL rollup
  * (`agg_sketch_merge`), for the "which items dominate" question.
  *
  * The catalog query (`agg_heavy_hitters`) pins the CONTRACT, not the
  * raw sketch (whose surviving low-count entries depend on merge
  * order): for every true heavy hitter, presence + never-overcount +
  * n/k undercount bound, all engine-deterministic booleans.
  */
object HeavyHitters {

  /** Misra–Gries over a string column; result is the surviving
    * (item → residual count) map. */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, "need k >= 2")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k - 1 => b.updated(x, 1L)
        case None =>
          // full and new: decrement everyone, drop zeros, skip x —
          // one of the k counts removed is x's own, preserving the
          // "undercount ≤ (decrement rounds) ≤ n/k" invariant
          b.collect { case (t, c) if c > 1 => t -> (c - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k - 1) sum
      else {
        // subtract the k-th largest residual from everyone; ≤ k-1
        // strictly-positive entries remain and the total undercount
        // stays bounded by n/k (mergeable-summaries argument)
        val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        sum.collect { case (t, c) if c > kth => t -> (c - kth) }
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The guarantee report over a corpus' whitespace tokens: one row
    * per TRUE heavy hitter (exact count · k > n), with the sketch's
    * contract checks. `in_sketch` / `underest_ok` / `bound_ok` are
    * mathematically always true — the point of the query is that the
    * engine PROVES it against the exact counts it also computes.
    */
  def tokenReport(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toks.as[String](Encoders.STRING)
      .select(new MisraGriesAgg(k).toColumn.name("sketch"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = exact.agg(sum("cnt").as("n"))
    exact.crossJoin(broadcast(tot))
      .filter(col("cnt") * k > col("n"))
      .crossJoin(broadcast(sketch))
      .select(
        col("tok"),
        col("cnt").cast("long").as("true_cnt"),
        // try_element_at: under ANSI mode (Spark 4 default) plain
        // element_at THROWS on a missing key — the contract columns
        // must be able to report false, not crash
        try_element_at(col("sketch"), col("tok")).isNotNull.as("in_sketch"),
        coalesce(try_element_at(col("sketch"), col("tok")) <= col("cnt"), lit(false))
          .as("underest_ok"),
        ((col("cnt") - coalesce(try_element_at(col("sketch"), col("tok")), lit(0L)))
          * k <= col("n")).as("bound_ok"))
  }
}
