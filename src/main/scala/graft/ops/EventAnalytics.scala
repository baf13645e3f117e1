package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the kline/event feed: ordered-funnel
  * completion and cohort retention — the "statistics of coin volumes"
  * intent of the reference's README generalized to the two queries
  * every event pipeline ends up needing.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the earliest strictly-increasing
    * chain of stage timestamps (stage i completes at the first event
    * of its type after stage i-1's completion). Returns one row per
    * user: user, m0..m{n-1} (epoch-ms, null = stage not reached).
    *
    * Scale shape: ONE shuffle — events filtered to the stage types,
    * grouped per user into a sorted array, and the state machine runs
    * as a codegen'd `aggregate` lambda over that array. No joins, no
    * per-stage re-scan (the conditional-min formulation scans the
    * fact once per stage and joins; this is the same semantics in a
    * single pass). Bound: the array holds one user's stage-typed
    * events; a pathological hot user degrades to
    * repartition+sortWithinPartitions+mapPartitions streaming the
    * events instead of materializing the array.
    */
  def funnelStages(events: DataFrame, user: Column, tsMs: Column,
                   typ: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.forall(_.matches("[A-Za-z0-9_]+")),
      "stage names must be simple identifiers")
    val n = stages.size
    val init = (0 until n).map(i => s"'m$i', CAST(NULL AS BIGINT)")
      .mkString("named_struct(", ", ", ")")
    val step = (0 until n).map { i =>
      val cond =
        if (i == 0) s"a.m0 IS NULL AND e.y = '${stages(0)}'"
        else s"a.m$i IS NULL AND a.m${i - 1} IS NOT NULL AND " +
          s"e.y = '${stages(i)}' AND e.t > a.m${i - 1}"
      s"'m$i', IF($cond, e.t, a.m$i)"
    }.mkString("named_struct(", ", ", ")")

    events.filter(typ.isin(stages: _*))
      .groupBy(user.as("user"))
      .agg(sort_array(collect_list(struct(tsMs.as("t"), typ.as("y")))).as("evs"))
      .withColumn("st", expr(s"aggregate(evs, $init, (a, e) -> $step)"))
      .select(col("user") +: (0 until n).map(i => col(s"st.m$i").as(s"m$i")): _*)
  }

  /** Cohort retention: users bucketed by first-seen day, activity
    * counted as distinct users per (cohort, day-offset). Two hash
    * aggregations and one join whose build side is one row per user —
    * broadcast-eligible far beyond any realistic user count.
    */
  def retention(events: DataFrame, user: Column, day: Column): DataFrame = {
    val first = events.groupBy(user.as("user")).agg(min(day).as("cohort"))
    events.select(user.as("user"), day.as("d"))
      .join(first, "user")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(count_distinct(col("user")).as("n_users"))
  }
}
