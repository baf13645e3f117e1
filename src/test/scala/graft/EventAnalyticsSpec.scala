package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{EventAnalytics, TimeSeries}

class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("funnel: stages complete only in strict time order") {
    val ev = Seq(
      // u1 completes all three in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE click — stage 3 never completes
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // u3: click at the same ms as view — strict > blocks stage 2
      (3L, 10L, "view"), (3L, 10L, "click"),
      // u4: noise types only
      (4L, 10L, "error"),
      // u5: click before the first view, then a later valid click
      (5L, 5L, "click"), (5L, 10L, "view"), (5L, 15L, "click")
    ).toDF("user_id", "t", "y")
    val f = EventAnalytics.funnelStages(ev, col("user_id"), col("t"), col("y"),
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(f.toSeq === Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), Some(30L), None),
      (3L, Some(10L), None, None),
      (5L, Some(10L), Some(15L), None)))
  }

  test("funnel runs in one shuffle: no joins, no per-stage re-aggregation") {
    val ev = Seq((1L, 10L, "view")).toDF("user_id", "t", "y")
    val plan = EventAnalytics.funnelStages(ev, col("user_id"), col("t"),
      col("y"), Seq("view", "click")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1)
  }

  test("retention: distinct users per (first-seen day, offset)") {
    val d = java.sql.Date.valueOf(_: String)
    val ev = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-01")), // same day twice: one user
      (1L, d("2024-01-03")),
      (2L, d("2024-01-01")), (2L, d("2024-01-03")),
      (3L, d("2024-01-02"))
    ).toDF("user_id", "day")
    val r = EventAnalytics.retention(ev, col("user_id"), col("day"))
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("day_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().sortBy(x => (x._1, x._2))
    assert(r.toSeq === Seq(
      ("2024-01-01", 0, 2L),   // u1+u2 on their day 0
      ("2024-01-01", 2, 2L),   // both return on day 2
      ("2024-01-02", 0, 1L)))
  }

  test("interpolate: observed buckets exact, gaps linear, edges null") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val obs = Seq(
      ("a", ts("2024-01-01 01:00:00"), 1000000L),  // v=1.0 @ hour 1
      ("a", ts("2024-01-01 04:00:00"), 4000000L),  // v=4.0 @ hour 4
      ("b", ts("2024-01-01 00:00:00"), 7000000L)   // pins grid start to hour 0
    ).toDF("key", "at", "micro")
    val out = TimeSeries.interpolate(obs, col("key"), col("at"), col("micro"), "hour")
      .filter($"k" === "a")
      .select(hour(timestamp_millis($"bucket_ms")), $"v", $"is_obs")
      .as[(Int, Option[Double], Boolean)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0, None, false),          // before first obs: no extrapolation
      (1, Some(1.0), true),
      (2, Some(2.0), false),     // lerp
      (3, Some(3.0), false),
      (4, Some(4.0), true)))
  }
}
