package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, when}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOfJoin, RangeJoin}

/** Semantics pins for the temporal join operators (ops.AsOfJoin,
  * ops.RangeJoin): `<=` match boundary, tie-breaking, tolerance
  * cutoff, window edge inclusivity, zero-match rows.
  */
class JoinOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) =
    rows.toDF("event_id", "user_id", "ts_ms")
  private def right(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "ts_ms", "event_id", "click_value")

  private def asof(l: org.apache.spark.sql.DataFrame,
                   r: org.apache.spark.sql.DataFrame,
                   tol: Option[Long] = None) =
    AsOfJoin.backward(l, r, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id", tol)
      .as[(Long, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)

  private def asofNative(l: org.apache.spark.sql.DataFrame,
                         r: org.apache.spark.sql.DataFrame,
                         tol: Option[Long] = None) =
    AsOfJoin.native(l, r, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id", tol)
      .as[(Long, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)

  test("asof: latest right row at-or-before left time; equal time matches") {
    val l = left((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 99L))
    val r = right((7L, 100L, 10L, 1.0), (7L, 200L, 11L, 2.0))
    val out = asof(l, r)
    assert(out(0) == ((1L, 7L, 100L, Some(100L), Some(1.0)))) // t=100 matches <=
    assert(out(1) == ((2L, 7L, 250L, Some(200L), Some(2.0)))) // latest wins
    assert(out(2) == ((3L, 7L, 99L, None, None)))             // nothing earlier
  }

  test("asof: keys never cross; max-tiebreak picks one row per (key, time)") {
    val l = left((1L, 7L, 500L), (2L, 8L, 500L))
    val r = right((7L, 400L, 10L, 1.0), (7L, 400L, 12L, 3.0), (9L, 450L, 20L, 9.0))
    val out = asof(l, r)
    assert(out(0) == ((1L, 7L, 500L, Some(400L), Some(3.0)))) // event_id 12 > 10
    assert(out(1) == ((2L, 8L, 500L, None, None)))            // user 9's row invisible
  }

  test("asof: tolerance nulls out stale matches") {
    val l = left((1L, 7L, 1000L), (2L, 7L, 2000L))
    val r = right((7L, 900L, 10L, 1.0))
    val out = asof(l, r, tol = Some(150L))
    assert(out(0)._4.contains(900L))  // 100ms old: within tolerance
    assert(out(1)._4.isEmpty)         // 1100ms old: too stale
  }

  test("range join: (t-window, t] inclusivity and zero counts") {
    val l = left((1L, 7L, 1000L), (2L, 7L, 5000L), (3L, 8L, 1000L))
    val r = Seq((7L, 0L), (7L, 1L), (7L, 1000L), (7L, 1001L))
      .toDF("user_id", "ts_ms") // window=1000: (0, 1000] for left t=1000
    val out = RangeJoin.countInWindow(l, r, Seq("user_id"), "ts_ms", "ts_ms", 1000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 7L, 1000L, 2L))) // t=1,1000 in; t=0 (=t-w) and 1001 out
    assert(out(1) == ((2L, 7L, 5000L, 0L))) // empty window still emits the row
    assert(out(2) == ((3L, 8L, 1000L, 0L))) // other user's clicks invisible
  }

  test("interval overlap: inclusive bounds, no self/dup pairs, multi-bucket once") {
    val iv = Seq(
      // key 1: [0,10] vs [10,20] touch at a point (inclusive ⇒ pair,
      // overlap 0); [0,10] vs [11,15] disjoint; [10,20] and [12,40]
      // share TWO buckets (1 and 2 at width 10) — the canonical-bucket
      // rule must emit that pair ONCE
      (1L, 100L, 0L, 10L), (1L, 101L, 10L, 20L),
      (1L, 102L, 11L, 15L), (1L, 103L, 12L, 40L),
      // key 2: identical interval to key 1's first — keys never cross
      (2L, 200L, 0L, 10L)
    ).toDF("k", "id", "s", "e")
    val out = RangeJoin.intervalOverlapSelfPairs(iv, Seq("k"), "id", "s", "e",
        bucketWidth = 10L)
      .select("k", "a_id", "b_id", "overlap_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 101L, 0L),   // touching endpoints, inclusive
      (1L, 101L, 102L, 4L),
      (1L, 101L, 103L, 8L),   // shares buckets 1 AND 2 — emitted once
      (1L, 102L, 103L, 3L)))
  }

  test("point-in-interval: inclusive ends, keys isolated, nulls dropped") {
    val pts = Seq((7L, 10L, 100L), (7L, 11L, 160L), (7L, 12L, 161L),
      (8L, 13L, 100L), (7L, 14L, -1L))
      .toDF("k", "pid", "t")
      // null point time → dropped, not matched
      .withColumn("t", when(col("t") >= 0, col("t")))
    val iv = Seq((7L, 100L, 100L, 160L), (7L, 101L, 150L, 250L))
      .toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointsInIntervals(pts, iv, Seq("k"), "pid", "t",
        "iid", "s", "e", bucketWidth = 60L)
      .select("p_pid", "i_iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 100L),              // t=100 == start, inclusive
      (11L, 100L), (11L, 101L), // t=160 == one end, inside the other
      (12L, 101L)))             // t=161 just past 100's end
    // key 8's point never crosses into key 7's windows; null-t absent
  }

  test("point-in-interval: parity with the naive theta-join on random data") {
    val rnd = new scala.util.Random(53)
    val pts = (0 until 300).map(i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val ivs = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(4).toLong, 1000L + i, s, s + rnd.nextInt(150))
    }
    val naive = (for {
      p <- pts; v <- ivs
      if p._1 == v._1 && v._3 <= p._3 && p._3 <= v._4
    } yield (p._2, v._2)).toSet
    // the bucket width is a pure performance knob: any positive width
    // must yield identical pairs (1 = every unit its own bucket,
    // 5000 = everything in one bucket)
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val out = RangeJoin.pointsInIntervals(
          pts.toDF("k", "pid", "t").repartition(5),
          ivs.toDF("k", "iid", "s", "e").repartition(3),
          Seq("k"), "pid", "t", "iid", "s", "e", bucketWidth = w)
        .select("p_pid", "i_iid").as[(Long, Long)].collect().toSet
      assert(out == naive, s"width $w diverged")
    }
  }

  test("interval overlap: reversed interval fails loudly, not silently") {
    val iv = Seq((1L, 100L, 10L, 0L)).toDF("k", "id", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlapSelfPairs(iv, Seq("k"), "id", "s", "e", 10L)
        .collect()
    }
    assert(ex.getMessage.contains("end < start") ||
      Option(ex.getCause).exists(_.getMessage.contains("end < start")))
  }

  test("interval overlap: parity with the naive theta-join on random data") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, i.toLong, s, s + rnd.nextInt(80))
    }
    val iv = rows.toDF("k", "id", "s", "e").repartition(7)
    val naive = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2, math.min(a._4, b._4) - math.max(a._3, b._3))).toSet
    // any positive width must yield identical pairs — the canonical-
    // bucket single-emission rule must hold at every granularity
    for (w <- Seq(3L, 50L, 400L, 5000L)) {
      val banded = RangeJoin.intervalOverlapSelfPairs(iv, Seq("k"), "id", "s", "e",
          bucketWidth = w)
        .select("k", "a_id", "b_id", "overlap_len")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(banded == naive, s"width $w diverged")
    }
  }

  test("asof: matches the naive per-row argmax formulation on random data") {
    val rnd = new scala.util.Random(13)
    val l = left((1 to 300).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(5000).toLong)): _*)
    val r = right((1 to 900).map(i =>
      ((i % 7).toLong, rnd.nextInt(5000).toLong, i.toLong, rnd.nextInt(100).toDouble)): _*)
    val fast = asof(l, r).toSeq
    // naive: for each left row, scan all right rows of the key
    val rightRows = r.as[(Long, Long, Long, Double)].collect()
    val naive = l.as[(Long, Long, Long)].collect().sortBy(_._1).map {
      case (id, k, t) =>
        val m = rightRows.filter(x => x._1 == k && x._2 <= t)
        if (m.isEmpty) (id, k, t, None: Option[Long], None: Option[Double])
        else {
          val best = m.maxBy(x => (x._2, x._3)) // latest time, then max tiebreak
          (id, k, t, Some(best._2), Some(best._4))
        }
    }.toSeq
    assert(fast == naive)
  }

  test("asof native: boundary, tiebreak, and tolerance semantics match backward") {
    val l = left((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 99L), (4L, 8L, 500L))
    val r = right((7L, 100L, 10L, 1.0), (7L, 100L, 12L, 5.0), (7L, 200L, 11L, 2.0),
      (9L, 450L, 20L, 9.0))
    assert(asofNative(l, r).toSeq == asof(l, r).toSeq)
    val lt = left((1L, 7L, 1000L), (2L, 7L, 2000L))
    val rt = right((7L, 900L, 10L, 1.0))
    assert(asofNative(lt, rt, tol = Some(150L)).toSeq ==
      asof(lt, rt, tol = Some(150L)).toSeq)
  }

  test("asof native: parity with the union-window form on random multi-partition data") {
    val rnd = new scala.util.Random(29)
    val l = left((1 to 500).map(i =>
      (i.toLong, (i % 11).toLong, rnd.nextInt(5000).toLong)): _*).repartition(7)
    val r = right((1 to 1500).map(i =>
      ((i % 11).toLong, rnd.nextInt(5000).toLong, i.toLong, rnd.nextInt(100).toDouble)): _*)
      .repartition(5)
    assert(asofNative(l, r).toSeq == asof(l, r).toSeq)
    assert(asofNative(l, r, tol = Some(300L)).toSeq == asof(l, r, tol = Some(300L)).toSeq)
  }

  test("asof native: plans as the custom operator and reuses an existing key partitioning") {
    val l = left((1 to 50).map(i => (i.toLong, (i % 3).toLong, i * 10L)): _*)
    val r = right((1 to 50).map(i => ((i % 3).toLong, i * 7L, i.toLong, 1.0)): _*)
    val plain = AsOfJoin.native(l, r, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id")
    val plainPhys = plain.queryExecution.executedPlan.toString
    // executedPlan is the AdaptiveSparkPlan wrapper (collect doesn't
    // descend into it) — assert on the rendered operator
    assert(plainPhys.contains("AsOfJoin ["), s"custom operator missing:\n$plainPhys")
    assert("Exchange hashpartitioning".r.findAllIn(plainPhys).size == 2)

    // a left side already hash-partitioned on the key satisfies the
    // operator's ClusteredDistribution — EnsureRequirements must NOT
    // add a third exchange (the union-window form always re-shuffles)
    val pre = AsOfJoin.native(
      l.repartition(org.apache.spark.sql.functions.col("user_id")), r,
      Seq("user_id"), "ts_ms", "ts_ms", Seq("click_value"), "event_id")
    val prePhys = pre.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(prePhys).size == 2,
      s"expected the explicit repartition + one right-side exchange only:\n$prePhys")
  }

  test("asof native: empty sides and null keys behave like the union-window form") {
    val l = left((1L, 7L, 100L))
    val rEmpty = right().limit(0)
    assert(asofNative(l, rEmpty).toSeq == asof(l, rEmpty).toSeq)
    assert(asofNative(left(), rEmpty).isEmpty)

    // null keys group together (both forms treat the key as a grouping
    // key, not a SQL equality): a null-key left row matches the latest
    // null-key right row
    val lNull = Seq((1L, Option.empty[Long], 100L), (2L, Some(7L), 100L))
      .toDF("event_id", "user_id", "ts_ms")
    val rNull = Seq((Option.empty[Long], 50L, 10L, 1.5), (Some(7L), 60L, 11L, 2.5))
      .toDF("user_id", "ts_ms", "event_id", "click_value")
    val nat = AsOfJoin.native(lNull, rNull, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id")
      .as[(Long, Option[Long], Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    val win = AsOfJoin.backward(lNull, rNull, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id")
      .as[(Long, Option[Long], Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(nat == win)
    assert(nat.head == ((1L, None, 100L, Some(50L), Some(1.5))))
  }

  private def asofNativeDir(l: org.apache.spark.sql.DataFrame,
                            r: org.apache.spark.sql.DataFrame,
                            direction: String,
                            tol: Option[Long] = None) =
    AsOfJoin.native(l, r, Seq("user_id"), "ts_ms", "ts_ms",
      Seq("click_value"), "event_id", tol, direction)
      .as[(Long, Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq

  /** Naive per-row reference for all three directions. */
  private def asofNaive(l: org.apache.spark.sql.DataFrame,
                        r: org.apache.spark.sql.DataFrame,
                        direction: String,
                        tol: Option[Long] = None) = {
    val rightRows = r.as[(Long, Long, Long, Double)].collect()
    l.as[(Long, Long, Long)].collect().sortBy(_._1).map { case (id, k, t) =>
      val keyRows = rightRows.filter(_._1 == k)
      val cand = direction match {
        case "backward" =>
          val m = keyRows.filter(x => x._2 <= t && tol.forall(t - x._2 <= _))
          if (m.isEmpty) None else Some(m.maxBy(x => (x._2, x._3)))
        case "forward" =>
          val m = keyRows.filter(x => x._2 >= t && tol.forall(x._2 - t <= _))
          if (m.isEmpty) None
          else {
            val t0 = m.map(_._2).min
            Some(m.filter(_._2 == t0).maxBy(_._3))
          }
        case "nearest" =>
          val m = keyRows.filter(x => tol.forall(math.abs(x._2 - t) <= _))
          if (m.isEmpty) None
          else {
            val d0 = m.map(x => math.abs(x._2 - t)).min
            val atMin = m.filter(x => math.abs(x._2 - t) == d0)
            // ties to the backward side; max tiebreak within the time
            val side = if (atMin.exists(_._2 <= t)) atMin.filter(_._2 <= t)
                       else atMin
            val t0 = side.map(_._2).min // backward side has ONE time (t-d0)
            Some(side.filter(_._2 == t0).maxBy(_._3))
          }
      }
      cand match {
        case Some(b) => (id, k, t, Some(b._2), Some(b._4))
        case None => (id, k, t, None: Option[Long], None: Option[Double])
      }
    }.toSeq
  }

  test("asof native forward: earliest at-or-after, tiebreak, tolerance") {
    val l = left((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 999L), (4L, 8L, 10L))
    val r = right((7L, 100L, 10L, 1.0), (7L, 100L, 12L, 5.0), (7L, 300L, 11L, 2.0),
      (9L, 450L, 20L, 9.0))
    val out = asofNativeDir(l, r, "forward")
    assert(out(0) == ((1L, 7L, 100L, Some(100L), Some(5.0)))) // equal time, max tb
    assert(out(1) == ((2L, 7L, 250L, Some(300L), Some(2.0)))) // earliest after
    assert(out(2) == ((3L, 7L, 999L, None, None)))            // nothing later
    assert(out(3) == ((4L, 8L, 10L, None, None)))             // user 9 invisible
    // tolerance bounds rightTime - leftTime
    val tolOut = asofNativeDir(l, r, "forward", tol = Some(40L))
    assert(tolOut(0)._4.contains(100L) && tolOut(1)._4.isEmpty)
  }

  test("asof native nearest: min distance, ties to backward, tolerance") {
    val l = left((1L, 7L, 150L), (2L, 7L, 201L), (3L, 7L, 199L), (4L, 7L, 100L))
    val r = right((7L, 100L, 10L, 1.0), (7L, 300L, 11L, 2.0))
    val out = asofNativeDir(l, r, "nearest")
    assert(out(0) == ((1L, 7L, 150L, Some(100L), Some(1.0)))) // Δ50 vs Δ150
    assert(out(1) == ((2L, 7L, 201L, Some(300L), Some(2.0)))) // Δ101 vs Δ99
    assert(out(2) == ((3L, 7L, 199L, Some(100L), Some(1.0)))) // Δ99 vs Δ101
    assert(out(3) == ((4L, 7L, 100L, Some(100L), Some(1.0)))) // exact hit, Δ0
    // equidistant: backward wins
    val eq = asofNativeDir(left((9L, 7L, 200L)), r, "nearest")
    assert(eq.head == ((9L, 7L, 200L, Some(100L), Some(1.0))))
    // tolerance bounds |Δ|
    val tolOut = asofNativeDir(l, r, "nearest", tol = Some(60L))
    assert(tolOut(0)._4.contains(100L) && tolOut(1)._4.isEmpty)
  }

  test("asof native forward/nearest: parity with naive on random multi-partition data") {
    val rnd = new scala.util.Random(31)
    val l = left((1 to 400).map(i =>
      (i.toLong, (i % 9).toLong, rnd.nextInt(4000).toLong)): _*).repartition(7)
    val r = right((1 to 1200).map(i =>
      ((i % 9).toLong, rnd.nextInt(4000).toLong, i.toLong, rnd.nextInt(100).toDouble)): _*)
      .repartition(5)
    for (d <- Seq("forward", "nearest"); tol <- Seq(None, Some(250L))) {
      assert(asofNativeDir(l, r, d, tol) == asofNaive(l, r, d, tol),
        s"direction=$d tol=$tol")
    }
    // backward through the same harness (regression for the refactor)
    assert(asofNativeDir(l, r, "backward") == asofNaive(l, r, "backward"))
  }

  test("asof native: output-name collisions with the left side fail fast") {
    val l = left((1L, 7L, 100L)).withColumn(
      "click_value", org.apache.spark.sql.functions.lit(0.0))
    val r = right((7L, 50L, 10L, 1.5))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.native(l, r, Seq("user_id"), "ts_ms", "ts_ms",
        Seq("click_value"), "event_id")
    }
    assert(e.getMessage.contains("click_value"))
    val l2 = left((1L, 7L, 100L)).withColumn(
      "asof_time", org.apache.spark.sql.functions.lit(0L))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.native(l2, r, Seq("user_id"), "ts_ms", "ts_ms",
        Seq("click_value"), "event_id")
    }
    assert(e2.getMessage.contains("asof_time"))
  }

  test("range join: counts match a direct theta-join on random data") {
    val n = 400
    val rnd = new scala.util.Random(7)
    val l = left((1 to n).map(i => (i.toLong, (i % 5).toLong, rnd.nextInt(10000).toLong)): _*)
    val r = (1 to 2000).map(i => ((i % 5).toLong, rnd.nextInt(10000).toLong))
      .toDF("user_id", "ts_ms")
    val banded = RangeJoin.countInWindow(l, r, Seq("user_id"), "ts_ms", "ts_ms", 500L)
      .as[(Long, Long, Long, Long)].collect().map(t => (t._1, t._4)).toMap
    val naive = l.as("l").join(r.as("r"),
        $"l.user_id" === $"r.user_id" &&
          $"r.ts_ms" > $"l.ts_ms" - 500L && $"r.ts_ms" <= $"l.ts_ms", "left_outer")
      .groupBy($"l.event_id").agg(org.apache.spark.sql.functions.count($"r.ts_ms"))
      .as[(Long, Long)].collect().toMap
    assert(banded == naive)
  }
}
