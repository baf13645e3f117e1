package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Cdc, TimeSeries}

/** ops.Cdc (changelog apply, SCD2) and ops.TimeSeries (gap fill)
  * semantics on hand-computable inputs.
  */
class CdcTimeSeriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- Cdc.applyLatest ---- //

  private def changes = Seq(
    // (key, seq, op, v)
    (1L, 1L, "U", 10.0), (1L, 3L, "U", 30.0), (1L, 2L, "U", 20.0),
    (2L, 1L, "U", 11.0), (2L, 2L, "D", 0.0),               // deleted last
    (3L, 1L, "D", 0.0), (3L, 2L, "U", 33.0),               // resurrected
    (4L, 9L, "D", 0.0)                                     // only a delete
  ).toDF("key", "seq", "op", "v")

  test("applyLatest keeps the highest-seq row per key and drops deleted keys") {
    val out = Cdc.applyLatest(changes, col("key"), col("seq"), col("op"),
        deleteOp = "D", payload = Seq("v" -> col("v")))
      .select("k", "last_seq", "v").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 3L, 30.0), (3L, 2L, 33.0)))
  }

  test("applyLatest is one partial-aggregated agg — no window sort, no join") {
    val plan = Cdc.applyLatest(changes, col("key"), col("seq"), col("op"),
      "D", Seq("v" -> col("v"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"))
    // map-side partials: the shuffle carries one row per key
    assert(plan.contains("partial_max_by"))
  }

  // ---- Cdc.scd2 ---- //

  test("scd2 collapses runs to validity intervals with versions") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val hist = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"), // same run — collapsed
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "A"), // A again — NEW version
      (2L, ts("2024-01-01 00:00:00"), 5L, "X")
    ).toDF("key", "at", "id", "status")
    val out = Cdc.scd2(hist, col("key"), Seq(col("at"), col("id")),
        col("status"), col("at"))
      .select($"k", $"attr", date_format($"eff_from", "MM-dd").as("from"),
        date_format($"eff_to", "MM-dd").as("to"), $"version", $"is_current")
      .as[(Long, String, String, String, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._5))
    assert(out.toSeq === Seq(
      (1L, "A", "01-01", "01-03", 1L, false),
      (1L, "B", "01-03", "01-04", 2L, false),
      (1L, "A", "01-04", null, 3L, true),
      (2L, "X", "01-01", null, 1L, true)))
  }

  // ---- TimeSeries.gapFillFF ---- //

  test("gapFillFF densifies to the global grid and forward-fills") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val obs = Seq(
      ("a", ts("2024-01-01 00:10:00"), 100L),
      ("a", ts("2024-01-01 00:20:00"), 5L),   // same bucket — summed
      ("a", ts("2024-01-01 03:00:00"), 7L),   // 2 gap hours before
      ("b", ts("2024-01-01 02:30:00"), 50L)   // late starter: leading nulls
    ).toDF("key", "at", "micro")
    val out = TimeSeries.gapFillFF(obs, col("key"), col("at"), col("micro"), "hour")
      .select($"k", hour($"bucket"), $"v_micro", $"n_obs", $"is_gap")
      .as[(String, Int, Option[Long], Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("a", 0, Some(105L), 2L, false),
      ("a", 1, Some(105L), 0L, true),   // forward-filled
      ("a", 2, Some(105L), 0L, true),
      ("a", 3, Some(7L), 1L, false),
      ("b", 0, None, 0L, true),         // before first observation: null
      ("b", 1, None, 0L, true),
      ("b", 2, Some(50L), 1L, false),
      ("b", 3, Some(50L), 0L, true)))
  }

  test("gapFill spine comes from a broadcast single-row bounds join, not a collect") {
    val obs = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("key", "at", "micro")
    val plan = TimeSeries.gapFillFF(obs, col("key"), col("at"), col("micro"), "hour")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }
}
