package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Similarity

/** Recall-floor probe for the zero-training binary scan tier
  * ([[graft.ops.Similarity.binaryTopK]]): runs the catalog
  * configuration of `ext_sim_binary` (248-bit sign codes, corpus-
  * scaled rerank = n/25 floored 100 capped 10k, query stride
  * `vec_id % 50 = 0`) against the exact cosine top-10 and prints
  * per-query min/avg hits and the below-3 count — the measured basis
  * for the gate's ≥ 3 contract, same protocol as the other sim-family
  * floors (tools.AdaptiveProbe / AppendProbe). Also records the scan
  * + rerank wall (best-of-2) so the tier's cost sits next to its
  * floor.
  *
  * Usage: runMain graft.tools.BinaryProbe <sfDir> [nBits]
  */
object BinaryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // the optional nBits arg is positional but mode flags (filtered /
    // split / explain / debug) may occupy slot 1 — only digits parse
    val nBits = args.lift(1).filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(248)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("debug"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            if (si.taskMetrics.executorRunTime > 2000)
              println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
                f"runTime=${si.taskMetrics.executorRunTime / 1000.0}%.1f s " +
                si.name.take(80))
          }
        })

    // NOT checkpointed: binaryTopK's stream-side spread() estimates
    // width from FILE relations — an RDD-backed (checkpointed) leaf
    // previously assumed wide, so a one-split fixture would pin the
    // whole codes × queries scan to ONE task (measured 289 s at sf1
    // for a scan the file-backed catalog entry runs in seconds; Par
    // now reads the real width, but the probe keeps the file-backed
    // shape the catalog entry has). `clustered:<n>` uses the
    // ClusteredFixture generator (repartitioned wide) — the shape
    // real embedding corpora have, same fixture the adaptive-probe
    // evidence uses.
    val emb =
      if (sfDir.startsWith("clustered:")) {
        val p = sfDir.stripPrefix("clustered:").split(':')
        ClusteredFixture.frame(spark, p(0).toLong,
            nClusters = p.lift(1).map(_.toInt).getOrElse(50),
            noise = p.lift(2).map(_.toDouble).getOrElse(0.35),
            bgFrac = p.lift(3).map(_.toDouble).getOrElse(0.1))
          .repartition(cpus.toInt)
      } else Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val rr = math.min(10000L, math.max(100L, n / 25)).toInt
    val qs = emb.filter(col("vec_id") % 50 === 0).localCheckpoint()
    println(s"fixture=$sfDir n=$n queries=${qs.count()} rerank=$rr nBits=$nBits")

    if (args.contains("split")) {
      // stage isolation: sign cost alone, pair scan + Hamming alone,
      // then + top-rerank selection, then the full path — localizes a
      // regression to the tier that caused it
      import graft.ops.TopK
      import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
      import graft.functions.VectorFunctions.signBands
      val planes = Similarity.hyperplanes(nBits, 64, 42L)
      val blocks = planes.grouped(62).toSeq
      def sig(c: org.apache.spark.sql.Column) =
        array(blocks.map(b => signBands(c, b)): _*)
      val codes = graft.ops.Par.spread(emb)
        .select(col("vec_id").as("c_id"), sig(col("embedding")).as("c_sig"))
      val qsig = qs.select(col("vec_id").as("q_id"),
        sig(col("embedding")).as("q_sig"))
      val scored = codes.join(broadcast(qsig), col("q_id") =!= col("c_id"))
        .withColumn("nham", -toCol(graft.functions.HammingExpr(
          toExpr(col("c_sig")), toExpr(col("q_sig")))).cast("double"))
        .select(col("q_id"), col("c_id"), col("nham"))
      def t(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime(); val n = body
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
      }
      t("codes")(codes.count())
      t("scored")(scored.count())
      t("scored+agg")(scored.groupBy("q_id").agg(max("nham")).count())
      t("scored+topk")(TopK.topKByLongKey(scored, "q_id", "nham", "c_id",
        rr).count())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "100000")
      t("scored+topk/hiThreshold")(TopK.topKByLongKey(scored, "q_id",
        "nham", "c_id", rr).count())
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      // distinct-value control: same rows, k, and groups, but the
      // ranked value is unique per candidate — isolates whether the
      // quantized tie mass (249 Hamming levels) is what the selection
      // stage is paying for
      val distinctVal = scored.withColumn("nham2",
        col("nham") - col("c_id").cast("double") / 1e12)
      t("scored+topk/distinct")(TopK.topKByLongKey(distinctVal, "q_id",
        "nham2", "c_id", rr).count())
      // small-k control at the same value distribution
      t("scored+topk/k10")(TopK.topKByLongKey(scored, "q_id", "nham",
        "c_id", 10).count())
      // brute-force control: identical join/agg shape, cosine values
      val bq = qs.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      val bscored = graft.ops.Par.spread(emb)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        .join(broadcast(bq), col("q_id") =!= col("c_id"))
        .withColumn("cos", toCol(graft.functions.DotProductExpr(
          toExpr(col("q_emb")), toExpr(col("c_emb")))))
        .select(col("q_id"), col("c_id"), col("cos"))
      t("brute+topk/k800")(TopK.topKByLongKey(bscored, "q_id", "cos",
        "c_id", rr).count())
      // materialization control: if forcing the code table eager
      // collapses the cost, the sig projection was being re-evaluated
      // per candidate pair inside the join stage
      val codesM = codes.localCheckpoint()
      val scoredM = codesM.join(broadcast(qsig), col("q_id") =!= col("c_id"))
        .withColumn("nham", -toCol(graft.functions.HammingExpr(
          toExpr(col("c_sig")), toExpr(col("q_sig")))).cast("double"))
        .select(col("q_id"), col("c_id"), col("nham"))
      t("scoredM+topk")(TopK.topKByLongKey(scoredM, "q_id", "nham",
        "c_id", rr).count())
      spark.stop(); return
    }
    if (args.contains("explain")) {
      println(Similarity.binaryTopK(qs, emb, k = 10, nBits = nBits,
        rerank = rr).queryExecution.executedPlan.toString.take(12000))
      spark.stop(); return
    }
    if (args.contains("ivfpqfiltered")) {
      // the ext_sim_filtered_ivfpq catalog configuration: labeled
      // IVF-PQ index (nlist 16, m 8, ksub 64), filter-calibrated
      // margin, nprobe0 6 → nprobeMax 16 escalation; recall vs the
      // FILTERED exact top-10 at the catalog predicate (label = 3,
      // ~10 %) AND a selective ~1 % predicate (label ∧ id stride) —
      // the regime where probed cells empty and escalation carries
      // the floor. Works on both the datagen fixtures and the
      // clustered generator (label is cluster-correlated there — the
      // label-starved-cells adversarial case).
      val dir = java.nio.file.Files
        .createTempDirectory("ivfpqprobe-filt").toString + "/idx"
      Similarity.buildIvfPqIndex(emb, dir, nlist = 16, m = 8, ksub = 64,
        seed = 42L, metaCols = Seq("label"))
      val sample = emb.filter(col("vec_id") % 97 === 13).orderBy("vec_id")
        .limit(256).localCheckpoint()
      def floors(tag: String, predIdx: org.apache.spark.sql.Column,
                 predEmb: org.apache.spark.sql.Column): Unit = {
        val margin = Similarity.calibrateAdaptiveMargin(spark, dir, sample,
          k = 10, nprobe0 = 6, minHits = 5, rerank = rr,
          predicate = Some(predIdx))
        val exactF = Similarity.bruteForceTopK(qs, emb.filter(predEmb),
          k = 10).select("q_id", "c_id").localCheckpoint()
        def runF() = Similarity.ivfPqIndexedTopKFiltered(spark, dir, qs,
          predicate = predIdx, k = 10, nprobe0 = 6, nprobeMax = 16,
          margin = margin, rerank = rr)
        val hf = exactF.join(
            runF().select(col("q_id"), col("c_id"), lit(1).as("hit")),
            Seq("q_id", "c_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .agg(min("hits").as("min"), avg("hits").as("avg"),
            sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"))
          .head()
        def timeF(): Double = {
          val t0 = System.nanoTime(); runF().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"ivfpqfiltered[$tag]: margin=$margin%.3f " +
          f"minHits=${hf.getLong(0)} avgHits=${hf.getDouble(1)}%.2f " +
          f"below3=${hf.getLong(2)} " +
          f"wall=${Seq(timeF(), timeF()).min}%.2fs (best-of-2)")
      }
      floors("label=3 ~10%", col("label") === 3, col("label") === 3)
      // ~1 % selective: the label conjunct pushes to the scan; the id
      // stride evaluates post-scan but still BEFORE candidate
      // selection, so correctness semantics are identical. DECADE
      // stride (id/10 % 10), not id % 10 — on the clustered fixture
      // label is id%10-derived, so an id%10 conjunct would intersect
      // to empty instead of thinning within the label
      floors("label=3 & id/10%10=0 ~1%",
        col("label") === 3 && pmod(floor(col("c_id") / 10), lit(10)) === 0,
        col("label") === 3 && pmod(floor(col("vec_id") / 10), lit(10)) === 0)
      spark.stop(); return
    }
    if (args.contains("lshfiltered")) {
      // the ext_sim_filtered_lsh catalog configuration: adaptive
      // metadata-bearing LSH index, radius 2 → 3 escalation on
      // starvation, exact brute fall-through for still-starved
      // queries. The catalog GATE is exact-replication (hash vs
      // DuckDB's identical three-tier computation); these floors
      // measure the SEMANTIC quality of that contract — how much of
      // the FILTERED true top-10 the escalating probe recovers — at
      // the catalog predicate (label = 3, ~10 %) and a selective
      // ~1 % one, on the datagen fixtures AND the clustered
      // generator (cluster-correlated label).
      val table = "graft_lshprobe_filt"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_meta")
      for (suf <- Seq("", "_meta")) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.conf.warehousePath, table + suf)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
      }
      val bits = Similarity.buildLshIndexAdaptive(emb, table, n = n,
        metaCols = Seq("label"))
      // the catalog entry's probe-budget bound at the MAX radius
      val bound = math.min(100000L,
        50L * (90000 / Similarity.probeMaskCount(bits, 3)))
      val qsB = qs.filter(col("vec_id") < bound).localCheckpoint()
      println(s"lshfiltered: bits=$bits bound=$bound queries=${qsB.count()}")
      def floorsL(tag: String, predIdx: org.apache.spark.sql.Column,
                  predEmb: org.apache.spark.sql.Column): Unit = {
        val exactF = Similarity.bruteForceTopK(qsB, emb.filter(predEmb),
          k = 10).select("q_id", "c_id").localCheckpoint()
        def runF() = Similarity.lshIndexedTopKFiltered(spark, table, qsB,
          predicate = predIdx, k = 10, probeDist0 = 2, probeDistMax = 3)
        val hf = exactF.join(
            runF().select(col("q_id"), col("c_id"), lit(1).as("hit")),
            Seq("q_id", "c_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .agg(min("hits").as("min"), avg("hits").as("avg"),
            sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"),
            count(lit(1)).as("nq"))
          .head()
        def timeF(): Double = {
          val t0 = System.nanoTime(); runF().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"lshfiltered[$tag]: minHits=${hf.getLong(0)} " +
          f"avgHits=${hf.getDouble(1)}%.2f below3=${hf.getLong(2)} " +
          f"of ${hf.getLong(3)} " +
          f"wall=${Seq(timeF(), timeF()).min}%.2fs (best-of-2)")
      }
      floorsL("label=3 ~10%", col("label") === 3, col("label") === 3)
      floorsL("label=3 & id/10%10=0 ~1%",
        col("label") === 3 && pmod(floor(col("c_id") / 10), lit(10)) === 0,
        col("label") === 3 && pmod(floor(col("vec_id") / 10), lit(10)) === 0)
      spark.stop(); return
    }
    if (args.contains("filtered")) {
      // the ext_sim_filtered catalog configuration: labeled persisted
      // index, predicate label = 3 (~10 % of the corpus), recall vs
      // the FILTERED exact top-10 — the measured basis for the
      // filtered gate's ≥ 3 contract (label now also exists on the
      // clustered generator, cluster-correlated)
      val dir = java.nio.file.Files
        .createTempDirectory("binprobe-filt").toString + "/idx"
      Similarity.buildBinaryIndex(emb, dir, nBits = nBits, seed = 42L,
        metaCols = Seq("label"))
      val pred = col("label") === 3
      val exactF = Similarity.bruteForceTopK(qs, emb.filter(pred), k = 10)
        .select("q_id", "c_id").localCheckpoint()
      def runF() = Similarity.binaryIndexedTopK(spark, dir, qs, k = 10,
        rerank = rr, predicate = Some(pred))
      val hf = exactF.join(
          runF().select(col("q_id"), col("c_id"), lit(1).as("hit")),
          Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .agg(min("hits").as("min"), avg("hits").as("avg"),
          sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"))
        .head()
      println(f"filtered: minHits=${hf.getLong(0)} " +
        f"avgHits=${hf.getDouble(1)}%.2f below3=${hf.getLong(2)}")
      def timeF(): Double = {
        val t0 = System.nanoTime(); runF().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"filtered wall=${Seq(timeF(), timeF()).min}%.2fs (best-of-2)")
      spark.stop(); return
    }
    val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
      .select("q_id", "c_id").localCheckpoint()
    def run() = Similarity.binaryTopK(qs, emb, k = 10, nBits = nBits,
      rerank = rr)
    val h = exact.join(
        run().select(col("q_id"), col("c_id"), lit(1).as("hit")),
        Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      .agg(min("hits").as("min"), avg("hits").as("avg"),
        sum(when(col("hits") < 3, 1).otherwise(0)).as("below3"))
      .head()
    println(f"minHits=${h.getLong(0)} avgHits=${h.getDouble(1)}%.2f " +
      s"below3=${h.getLong(2)}")
    def time(): Double = {
      val t0 = System.nanoTime(); run().count(); (System.nanoTime() - t0) / 1e9
    }
    val wall = Seq(time(), time()).min
    println(f"wall=$wall%.2fs (best-of-2)")
    spark.stop()
  }
}
