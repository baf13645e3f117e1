package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.{Dedup, Similarity}

/** Evidence probe for the frozen-model index append
  * ([[graft.ops.Similarity.appendToIvfPqIndex]]):
  *
  *  1. RECALL — builds the `ext_sim_ivfpq_appended` configuration
  *     (index on even vec_ids at nlist=16/m=8/ksub=64, odd half
  *     appended; the build-half quantizer is the worst case the
  *     catalog gate runs) and prints per-query hit statistics against
  *     the exact top-10 over the FULL corpus — the numbers the catalog
  *     entry's Scaladoc cites.
  *  2. COST — times the production-shaped full-corpus build
  *     (nlist = semParams(n)) against appending a bounded 5000-row
  *     batch to it, so SCALE.md can record build-vs-append directly.
  *  3. DELTA — the `ext_sim_ivfpq_delta` configuration (index on the
  *     even half, odd half as a NOT-appended delta through
  *     [[graft.ops.Similarity.ivfPqIndexedTopKWithDelta]]) with the
  *     same hit statistics — the numbers that entry's Scaladoc cites.
  *  4. LIFECYCLE — build → three bounded appends → compaction →
  *     refit at production sizing; SCALE.md's lifecycle table.
  *
  * Usage: runMain graft.tools.AppendProbe <sfDir> [recall|cost|delta|lifecycle|both] [nprobe]
  * (`both` = recall + cost; `delta` and `lifecycle` are their own
  * modes; an unknown mode fails loudly rather than printing nothing.)
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(1).getOrElse("both")
    require(Set("recall", "cost", "delta", "lshdelta", "lifecycle", "both")(mode),
      s"AppendProbe: unknown mode '$mode' — expected " +
        "recall|cost|delta|lshdelta|lifecycle|both")
    val nprobe = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val rr = math.min(10000L, math.max(100L, n / 25)).toInt
    val tmp = java.nio.file.Files.createTempDirectory("append-probe").toString
    println(s"n=$n rerank=$rr dir=$sfDir")
    // ONE batch-shape policy for the cost and lifecycle modes — if the
    // bound changes, both tables keep measuring the same batch
    val boundedBatch = emb.filter(col("vec_id") % 20 === 1 && col("vec_id") < 100000)
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    if (mode == "recall" || mode == "both") {
      val dir = s"$tmp/half"
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir,
        nlist = 16, m = 8, ksub = 64, seed = 42L)
      Similarity.appendToIvfPqIndex(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      val qs = emb.filter(col("vec_id") % 50 === 0)
      val appended = Similarity.ivfPqIndexedTopK(spark, dir, qs, k = 10,
          nprobe = nprobe, rerank = rr)
        .select(col("q_id"), col("c_id"), lit(1).as("hit"))
      val hits = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select("q_id", "c_id")
        .join(appended, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      val stats = hits.agg(min(col("hits")).as("min"),
          expr("percentile(hits, 0.1)").as("p10"),
          avg(col("hits")).as("mean"), count(lit(1)).as("queries"))
        .head()
      println(f"[recall] min=${stats.getLong(0)} p10=${stats.getDouble(1)}%.1f " +
        f"mean=${stats.getDouble(2)}%.2f queries=${stats.getLong(3)}")
    }

    if (mode == "delta") {
      // ext_sim_ivfpq_delta's configuration: index on evens, odds as
      // an unappended delta through ivfPqIndexedTopKWithDelta
      val dir = s"$tmp/deltahalf"
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir,
        nlist = 16, m = 8, ksub = 64, seed = 42L)
      val qs = emb.filter(col("vec_id") % 50 === 0)
      val merged = Similarity.ivfPqIndexedTopKWithDelta(spark, dir,
          emb.filter(col("vec_id") % 2 =!= 0), qs, k = 10,
          nprobe = nprobe, rerank = rr)
        .select(col("q_id"), col("c_id"), lit(1).as("hit"))
      val hits = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select("q_id", "c_id")
        .join(merged, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      val stats = hits.agg(min(col("hits")).as("min"),
          avg(col("hits")).as("mean"), count(lit(1)).as("queries")).head()
      println(f"[delta] min=${stats.getLong(0)} mean=${stats.getDouble(1)}%.2f " +
        f"queries=${stats.getLong(2)}")
    }

    if (mode == "lshdelta") {
      // floors for the LSH freshness twin at the REGIME-DERIVED probe
      // radius vs its neighbors (r11 VERDICT #5): half-corpus adaptive
      // index, odd half as delta, catalog query bound — per-radius
      // min/mean/below3 + wall, so the radius rule ships with the
      // per-rung floor evidence it rests on
      val table = "graft_lshdelta_probe"
      val bitsHalf = Similarity.lshBits(n / 2)
      Similarity.buildLshIndexAdaptive(emb.filter(col("vec_id") % 2 === 0),
        table, dim = 64, seed = 42L, n = n / 2)
      val derived = Similarity.lshDeltaProbeDist
      println(s"[lshdelta] bitsHalf=$bitsHalf shippedRadius=$derived")
      for (pd <- 2 to 3) {
        val bound = math.min(100000L,
          50L * (90000 / Similarity.probeMaskCount(bitsHalf, pd)))
        val qs = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < bound)
          .localCheckpoint()
        def run() = Similarity.lshIndexedTopKWithDelta(spark, table,
          emb.filter(col("vec_id") % 2 =!= 0), qs, k = 10, probeDist = pd)
        val hits = Similarity.bruteForceTopK(qs, emb, k = 10)
          .select("q_id", "c_id")
          .join(run().select(col("q_id"), col("c_id"), lit(1).as("hit")),
            Seq("q_id", "c_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .agg(min(col("hits")).as("min"), avg(col("hits")).as("mean"),
            sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"),
            count(lit(1)).as("queries"))
          .head()
        val wall = Seq(t(run().write.mode("overwrite").format("noop").save()),
          t(run().write.mode("overwrite").format("noop").save())).min
        println(f"[lshdelta] radius=$pd${if (pd == derived) "*" else ""} " +
          f"bound=$bound queries=${hits.getLong(3)} min=${hits.getLong(0)} " +
          f"mean=${hits.getDouble(1)}%.2f below3=${hits.getLong(2)} " +
          f"wall=$wall%.2fs (best-of-2)")
      }
    }

    if (mode == "lifecycle") {
      // the full maintenance lifecycle at production sizing: one-time
      // build, three bounded appends, a compaction folding the
      // accumulated segments, a refit — the numbers SCALE.md's
      // lifecycle table records per sf
      val dir = s"$tmp/lifecycle"
      val nlist = graft.ops.Dedup.semParams(n)
      Similarity.clearIvfIndexCache()
      Similarity.clearPqCodebookCache()
      val tBuild = t(Similarity.buildIvfPqIndex(emb, dir, nlist = nlist,
        m = 8, ksub = 64, seed = 42L))
      val tAppends = (1 to 3).map(i => t(
        Similarity.appendToIvfPqIndex(spark, dir, boundedBatch, seg = Some(s"b$i"))))
      val tCompact = t(Similarity.compactIndex(spark, dir))
      Similarity.clearIvfIndexCache()
      Similarity.clearPqCodebookCache()
      val tRefit = t(Similarity.refitIvfPqIndex(spark, dir, nlist = nlist,
        m = 8, ksub = 64, seed = 43L))
      println(f"[lifecycle] nlist=$nlist build=$tBuild%.1f " +
        f"appends=${tAppends.map(x => f"$x%.1f").mkString(",")} " +
        f"compact=$tCompact%.1f refit=$tRefit%.1f s " +
        f"rows=${spark.read.parquet(dir).count()}")
    }

    if (mode == "cost" || mode == "both") {
      val dir = s"$tmp/full"
      val nlist = Dedup.semParams(n)
      Similarity.clearIvfIndexCache()
      Similarity.clearPqCodebookCache()
      val buildS = t(Similarity.buildIvfPqIndex(emb, dir, nlist = nlist,
        m = 8, ksub = 64, seed = 42L))
      val appends = (1 to 3).map(_ =>
        t(Similarity.appendToIvfPqIndex(spark, dir, boundedBatch)))
      println(f"[cost] nlist=$nlist build=$buildS%.1f s append(batch=${boundedBatch.count()})=" +
        appends.map(t => f"$t%.1f").mkString(",") + f" s best=${appends.min}%.1f s")
    }
    spark.stop()
  }
}
