package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.sinks.Routing

/** Scale-technique verification: salting preserves semantics, bucketed
  * joins eliminate the shuffle, approx-distinct tracks exact counts.
  */
class ScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted join == plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("name").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      plain.groupBy("name").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // the ×salts replicated dim must NEVER broadcast (no shuffle ⇒
    // salting pointless; builds salts× the driver table — OOMed at
    // sf25), and the join must be the spill-safe sort-merge, not
    // shuffle-hash (whose per-task build overflowed task memory at
    // the same scale)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"salted join planned a broadcast of the replicated dim:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"salted join must pin the spill-safe sort-merge strategy:\n$plan")
  }

  test("salted two-phase sum == direct sum") {
    val df = (1 to 5000).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("distributed rank suite == single-Window rank suite (incl. ntile remainders)") {
    // Ranks.totalOrderRankSuite exists because Window parallelism is
    // capped at the partition-by cardinality (5 tasks for 5
    // priorities, whatever the cluster) — it must be value-identical
    // to the window form. Group sizes chosen to exercise BOTH ntile
    // branches (n % 4 != 0) and the degenerate n < ntiles group.
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(41)
    val rows = (for {
      (g, n) <- Seq(("a", 997), ("b", 1000), ("c", 3), ("d", 1)).zipWithIndex
        .map { case ((g, n), _) => (g, n) }
      i <- 0 until n
    } yield (g, rnd.nextInt(200).toDouble, rnd.nextLong())).zipWithIndex
      .map { case ((g, v, _), i) => (g, v, i.toLong) }
    val df = rows.toDF("g", "v", "id").repartition(8)
    val got = graft.ops.Ranks.totalOrderRankSuite(df, Seq("g"), "v", "id",
        ntiles = 4, desc = true, buckets = 16)
      .select("g", "id", "drnk", "quartile", "prnk", "cdist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.select(col("g"), col("id"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want, "distributed rank suite diverged from the Window form")

    // null order values are refused loudly, not silently dropped
    val withNull = (rows :+ (("e", Double.NaN, -1L))).toDF("g", "v", "id")
      .withColumn("v", when(col("id") === -1L, lit(null).cast("double")).otherwise(col("v")))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Ranks.totalOrderRankSuite(withNull, Seq("g"), "v", "id")
    }
    assert(e.getMessage.contains("null"))

    // NaN is refused just as loudly: NaN sorts greatest so max()=NaN,
    // width_bucket(…, NaN, …) returns null for EVERY row and the
    // offset join would silently drop the whole output
    val withNaN = (rows :+ (("e", Double.NaN, -1L))).toDF("g", "v", "id")
    val eNaN = intercept[IllegalArgumentException] {
      graft.ops.Ranks.totalOrderRankSuite(withNaN, Seq("g"), "v", "id",
        buckets = 16)
    }
    assert(eNaN.getMessage.contains("NaN"))

    // empty input short-circuits to a typed empty result, not an NPE
    // on the null range-aggregate row
    val empty = graft.ops.Ranks.totalOrderRankSuite(
      df.where(lit(false)), Seq("g"), "v", "id", buckets = 16)
    assert(empty.count() == 0L)
    val sch = empty.schema
    assert(sch("drnk").dataType.typeName == "long")
    assert(sch("quartile").dataType.typeName == "long")
    assert(sch("prnk").dataType.typeName == "double")
    assert(sch("cdist").dataType.typeName == "double")

    // the size switch (default buckets) is value-identical too:
    // below the threshold the suite IS the plain-Window form
    val switched = graft.ops.Ranks.totalOrderRankSuite(df, Seq("g"), "v", "id",
        ntiles = 4, desc = true)
      .select("g", "id", "drnk", "quartile", "prnk", "cdist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(switched == want, "size-switched rank suite diverged")

    // EMPTY partition-by = one GLOBAL total order (the
    // ext_epoch_shuffle form: a global ORDER-BY Window is one task at
    // any cluster size, the two-level path is the whole point there)
    // — forced two-level must equal the global-Window row_number
    val wg = Window.orderBy(col("v"), col("id"))
    val wantGlobal = df.select(col("id"),
        row_number().over(wg).cast("long").as("drnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotGlobal = graft.ops.Ranks.totalOrderRankSuite(df, Seq.empty, "v", "id",
        desc = false, buckets = 16)
      .select("id", "drnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotGlobal == wantGlobal,
      "empty-partition two-level rank diverged from the global Window")
  }

  test("rank suite: duplicate (order, tie) pairs rank identically on both sides of the size switch") {
    // nothing enforces that (orderCol, tieCol) is a strict total
    // order, so an input with duplicate pairs must not change answers
    // depending on which side of the 2M-row switch it lands (r8
    // ADVICE: the old dense_rank/percent_rank small path disagreed
    // with the row_number-based two-level construction on ties)
    val dup = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 1L), ("a", 5.0, 1L), // 3-way full dup
      ("a", 3.0, 2L), ("a", 3.0, 2L), ("a", 1.0, 9L),
      ("b", 7.0, 1L), ("b", 7.0, 1L)
    ).toDF("g", "v", "id").repartition(4)
    def suite(buckets: Int) =
      graft.ops.Ranks.totalOrderRankSuite(dup, Seq("g"), "v", "id",
          ntiles = 4, desc = true, buckets = buckets)
        .groupBy("g", "v", "id")
        // per duplicate group, the SET of row-level outputs must match
        .agg(sort_array(collect_list(struct(col("drnk"), col("quartile"),
          col("prnk"), col("cdist")))).as("ranks"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getSeq[Any](3).toString)).toSet
    assert(suite(0) === suite(16),
      "tie handling diverged between the small path and the two-level path")
  }

  test("distributed running sum == single-Window cumulative sum; guards loud") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(43)
    // duplicate order values on purpose: the total order comes from
    // the (v, id) pair, and a boundary-straddling duplicate must not
    // double-count or skip weight
    val rows = (0 until 3000).map(i =>
      (rnd.nextInt(100).toDouble, i.toLong, (rnd.nextInt(50) + 1).toLong))
    val df = rows.toDF("v", "id", "w").repartition(8)
    val wg = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"), sum(col("w")).over(wg).as("run_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // forced two-level (buckets > 0) — the sf25 plan on small data
    val got = graft.ops.Ranks.totalOrderRunningSum(df, Seq.empty, "v", "id",
        "w", buckets = 16)
      .select("id", "run_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "two-level running sum diverged from the Window form")
    // the size switch resolves to the plain Window below threshold
    val switched = graft.ops.Ranks.totalOrderRunningSum(df, Seq.empty, "v",
        "id", "w")
      .select("id", "run_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(switched == want, "size-switched running sum diverged")
    // GROUPED form (the packChunks shape: low-cardinality partition-by
    // is one task per group under a plain Window) — forced two-level
    // must equal the per-group Window
    val grouped = df.withColumn("g", (col("id") % 3).cast("int"))
    val wgrp = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantGrp = grouped.select(col("id"), sum(col("w")).over(wgrp).as("run_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotGrp = graft.ops.Ranks.totalOrderRunningSum(grouped, Seq("g"), "v",
        "id", "w", buckets = 16)
      .select("id", "run_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotGrp == wantGrp, "grouped two-level running sum diverged")
    // null weights are refused loudly — sum() would silently skip
    // them and every later prefix would be wrong
    val withNullW = df.withColumn("w",
      when(col("id") === 7L, lit(null).cast("long")).otherwise(col("w")))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Ranks.totalOrderRunningSum(withNullW, Seq.empty, "v", "id",
        "w", buckets = 16)
    }
    assert(e.getMessage.contains("null"))
  }

  test("bucketed-by-key join plans with no shuffle exchange") {
    // in-memory catalog + persistent warehouse dir: clear leftovers
    // from previous JVMs before re-creating the managed tables
    for (t <- Seq("li_bkt", "o_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    Routing.writeBucketed(li.select("l_orderkey", "l_extendedprice"),
      "li_bkt", "l_orderkey", buckets = 4, sortCol = Some("l_orderkey"))
    Routing.writeBucketed(o.select("o_orderkey", "o_totalprice"),
      "o_bkt", "o_orderkey", buckets = 4, sortCol = Some("o_orderkey"))
    val joined = spark.table("li_bkt")
      .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == li.count()) // every lineitem has its order
  }

  test("date-partitioned layout prunes partitions on read-back") {
    // the reference derives year/month but never partitions by them
    // (SURVEY §1.3) — here the layout actually prunes
    val out = java.nio.file.Files.createTempDirectory("events-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("year", year(col("event_ts")))
      .withColumn("month", month(col("event_ts")))
      .write.mode("overwrite").partitionBy("year", "month").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("month") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("month"),
      s"month filter should prune partitions:\n$plan")
    assert(pruned.count() > 0)
  }

  test("sql surface: registered views + graft functions work via spark.sql") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    val sim = spark.sql(
      "SELECT graft_simhash(text) FROM documents LIMIT 1").head().getLong(0)
    assert(sim != 0L)
    // the whole near-dup primitive is SQL-expressible: shingle + jaccard
    val jac = spark.sql(
      """SELECT graft_jaccard(graft_shingles('a b c d', 1),
        |                     graft_shingles('a b c x', 1)) AS j""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(jac - 3.0 / 5.0) < 1e-12, s"jaccard was $jac")
    assert(spark.sql("SELECT graft_token_count('x y z')").head().getInt(0) == 3)
  }

  test("catalog plan audit: broadcasts, top-k, and shuffle counts are as designed") {
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

    // Q18-shape: both enrichment joins must avoid shuffling the big side
    // (customer broadcasts; the HAVING-filtered order list is tiny)
    assert(plan("agg_having").contains("BroadcastHashJoin"))
    // top-k vocabulary must be TakeOrderedAndProject, never a full sort
    assert(plan("ext_wordcount").contains("TakeOrderedAndProject"))
    assert(plan("sort_limit_topk").contains("TakeOrderedAndProject"))
    // decorrelated Q17: the correlation is ONE window pass — no
    // second scan of lineitem for the subquery side
    val q17 = plan("join_scalar_subquery")
    assert(q17.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 2,
      s"Q17 should scan lineitem once and part once:\n$q17")
    // decontamination: benchmark shingles broadcast into a semi-join
    val deco = plan("ext_decontaminate")
    assert(deco.contains("BroadcastHashJoin") && deco.contains("LeftSemi"))
  }

  test("catalog-wide plan sweep: no accidental cartesian or nested-loop joins") {
    // guards all 70+ queries at once: a dropped join predicate or a
    // non-equi condition silently degrading to BroadcastNestedLoop /
    // CartesianProduct is the classic 100 TB plan bug. Whitelisted,
    // each with a bounded small side by construction:
    //   join_cross    — intentional cartesian of two tiny dims;
    //   ext_sim_topk  — brute-force ANN baseline IS all-pairs: the
    //                   query set broadcasts against the corpus (the
    //                   scale path is ext_sim_lsh / ext_sim_ivf);
    //   ext_sim_ivf / ext_sim_ivf_indexed — query→nearest-centroid
    //                   assignment crosses |queries| × |centroids|
    //                   (both small) and the recall gate embeds the
    //                   brute-force baseline; corpus probing is the
    //                   equi-join on cell id (indexed: partition-
    //                   pruned scan).
    //   ts_gap_fill / ts_interpolate — spine construction crosses the
    //                   distinct key set with ONE broadcast min/max
    //                   bounds row;
    //   ext_tfidf     — the corpus-size scalar N joins in as ONE
    //                   broadcast row (same bounded shape as the
    //                   time-series bounds row);
    //   agg_heavy_hitters — the total-count scalar and the ≤(k-1)-entry
    //                   Misra–Gries sketch each join in as ONE
    //                   broadcast row against the heavy-hitter set.
    //   ext_lm_quality_tiers — the vocabulary-size scalar V joins in
    //                   as ONE broadcast row (same bounded shape as
    //                   ext_tfidf's corpus-size N).
    //   ext_sim_pq    — the ADC code scan crosses the broadcast query
    //                   set against 8-BYTE CODES (not vectors): the
    //                   all-pairs tier is the point of PQ, 32× lighter
    //                   than ext_sim_topk's, and the recall gate
    //                   embeds the brute-force baseline on top.
    //   ext_sim_ivfpq — same two bounded shapes composed: centroid
    //                   assignment crosses |rows| × |centroids| and
    //                   the recall gate embeds the brute-force
    //                   baseline; the scan tier itself is the
    //                   cell-pruned code equi-join.
    //   ext_sim_ivfpq_appended — identical shapes to _indexed (the
    //                   probe path is the same code); the append step
    //                   itself is an equi-partitioned write, no join.
    //   ext_sim_ivfpq_delta — the delta side IS brute force by
    //                   contract (batch-sized), plus the family's
    //                   embedded brute-force recall baseline.
    //   ext_sim_lsh_delta — same shape for the LSH family's twin:
    //                   exact brute force over the batch-sized delta
    //                   plus the embedded recall baseline.
    //   ext_sim_ivfpq_adaptive — identical probe shapes to _indexed
    //                   (both passes ARE that probe) plus the family's
    //                   embedded brute-force recall baseline; the
    //                   escalation decision itself is an equi-join.
    //   ext_sim_binary — the sign-code scan crosses the broadcast
    //                   query set against 32-BYTE packed sign codes (4
    //                   xor+bit_count ops per candidate — the lightest
    //                   all-pairs tier in the family), and the recall
    //                   gate embeds the brute-force baseline on top.
    //   ext_sim_filtered — the binary-indexed scan shape with a pushed
    //                   predicate SHRINKING the stored-code side ~10×,
    //                   plus the filtered brute-force recall baseline.
    //   ext_sim_filtered_ivfpq — the _adaptive probe shapes under a
    //                   predicate (both passes are the cell-pruned
    //                   equi-join, the predicate only SHRINKS the
    //                   scanned side) plus the FILTERED brute-force
    //                   recall baseline (~10 % of the corpus — the
    //                   lightest baseline in the family).
    //   ext_sim_ivfpq_deleted — the _indexed probe shapes (tombstones
    //                   only add a broadcast equi-anti-join) plus the
    //                   family's embedded brute-force recall baseline
    //                   over the REMAINING corpus.
    //   ext_sim_filtered_lsh — bucket-pruned equi-join probes at both
    //                   radii; queries still starved at the max
    //                   radius fall through to exact brute force over
    //                   the QUALIFYING rows only (bounded by the
    //                   predicate's selectivity — the tier that
    //                   guarantees k results where k qualify).
    //   ext_sim_retained — the ext_sim_binary_indexed scan shape
    //                   (retention tombstones only add a broadcast
    //                   equi-anti-join) plus the brute-force recall
    //                   baseline over the SURVIVING half.
    val allowed = Set("join_cross", "ext_sim_topk", "ext_sim_ivf",
      "ext_sim_ivf_indexed", "ts_gap_fill", "ts_interpolate", "ext_tfidf",
      "agg_heavy_hitters", "ext_lm_quality_tiers", "ext_sim_pq",
      "ext_sim_ivfpq", "ext_sim_ivfpq_indexed", "ext_sim_ivfpq_appended",
      "ext_sim_ivfpq_delta", "ext_sim_lsh_delta", "ext_sim_ivfpq_adaptive",
      "ext_sim_binary", "ext_sim_binary_indexed", "ext_sim_filtered",
      "ext_sim_filtered_ivfpq", "ext_sim_ivfpq_deleted",
      "ext_sim_filtered_lsh", "ext_sim_retained")
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad = !allowed(name) &&
        (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"unplanned cross products in: $offenders")
  }

  test("no heavy encode projection fused under a nested-loop join (BNLJ deferral guard)") {
    // BroadcastNestedLoopJoin's whole-stage codegen splices
    // UNEVALUATED stream-side projection variables into the
    // per-build-row loop, so an encode projection (sign packing, PQ
    // encode) fused into a BNLJ stage silently re-runs per candidate
    // PAIR instead of per row — the late-r10 defect that cost the PQ
    // scan 4–5× and the first-cut binary tier ~30× (SCALE.md
    // late-r10 §2; fixed by persisting the code tables, whose cache
    // boundary evaluates each row once). This guard mechanically pins
    // the boundary: in EVERY catalog and bench plan, no SignBandsExpr
    // / PqEncodeExpr may sit in a Project/Filter chain fused directly
    // under a nested-loop join's streamed side. AQE is disabled for
    // the build so the physical tree (not an adaptive wrapper) is
    // walkable.
    import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan,
      WholeStageCodegenExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def fusedProjects(p: SparkPlan): Seq[ProjectExec] = p match {
      case pr: ProjectExec => pr +: fusedProjects(pr.child)
      case f: FilterExec => fusedProjects(f.child)
      case w: WholeStageCodegenExec => fusedProjects(w.child)
      case _ => Nil // exchange / cached scan / input adapter: boundary
    }
    def heavy(pr: ProjectExec): Boolean = pr.projectList.exists(_.find {
      case _: graft.functions.SignBandsExpr => true
      case _: graft.functions.PqEncodeExpr => true
      case _ => false
    }.isDefined)
    val dir = "/root/testdata/sf0.001"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = (SparkEntry.queries ++ SparkEntry.benchQueries).toSeq
        .flatMap { case (name, fn) =>
          val plan = fn(spark, dir).queryExecution.executedPlan
          val bad = plan.collect {
            case b: BroadcastNestedLoopJoinExec =>
              val streamed = b.buildSide match {
                case BuildRight => b.left
                case BuildLeft => b.right
              }
              fusedProjects(streamed).exists(heavy)
          }.exists(identity)
          if (bad) Some(name) else None
        }
      assert(offenders.isEmpty,
        s"encode projection fused under a nested-loop join in: $offenders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("_metadata column: file-level lineage rides along any parquet scan") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("_metadata.file_path").as("src_file"),
        col("_metadata.file_size").as("src_bytes"))
    val row = df.head()
    assert(row.getAs[String]("src_file").contains("lineitem.parquet"))
    assert(row.getAs[Long]("src_bytes") > 0)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-dpp-fact"
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("mo", month(col("event_ts")))
      .write.mode("overwrite").partitionBy("mo").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = spark.range(1, 13).select(col("id").cast("int").as("mo"),
      (col("id") === 1).as("wanted"))
    val joined = fact.join(dim, Seq("mo")).filter(col("wanted"))
      .groupBy("mo").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in:\n$plan")
    assert(joined.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("runtime bloom filter: selective dim predicate filters the fact scan side") {
    // the rule's size gates target real clusters (apply side > 10 GiB);
    // lower them here to show the mechanism on fixture-size data
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set(saved(0)._1, "0")
      conf.set(saved(1)._1, "100MB")
      // broadcast-eligible joins skip the rule (the broadcast already
      // prunes); force the shuffle-join path the rule targets
      conf.set(saved(2)._1, "-1")
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      val o = Tables.orders(spark, "/root/testdata/sf0.01")
        .filter(col("o_totalprice") > 450000) // selective build side
      // defeat broadcast so the shuffle-join runtime filter applies
      val joined = li.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val Row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (Row.getLong(0), Row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
