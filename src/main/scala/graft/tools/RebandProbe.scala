package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** A/B for [[graft.etl.DedupIngest.rebandCorpus]] (r13 VERDICT #2):
  * grow an embedding-dedup corpus under DELIBERATELY-UNDERSIZED
  * banding (the "corpus outgrew its stream-start sizing" failure the
  * verb exists for), record the per-trigger admission wall as the
  * corpus grows, then reband to [[graft.ops.Dedup.annParams]]-sized
  * banding (switching to the bucketed layout) and re-measure the SAME
  * batch shape against the SAME corpus. The cost model says the
  * corpus-probe candidate count is batch × bands × corpus / 2^bits,
  * so widening bits by Δ should cut the probe wall ~2^Δ×; the probe
  * prints both walls and the ratio so the artifact carries the
  * measured reset, not the model.
  *
  * Usage: runMain graft.tools.RebandProbe [batchRows] [growBatches] [dupPct]
  */
object RebandProbe {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toInt).getOrElse(30000)
    val growBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val dupPct = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files
      .createTempDirectory("graft-rebandprobe").toString
    val corpusDir = s"$work/corpus"

    // the ComposedProbe fixture: xxhash64-keyed embeddings, planted dups
    def hashEmb(idCol: String) =
      s"transform(sequence(0, 63), i -> " +
        s"cast(pmod(xxhash64($idCol, i), 2000001) / 1000000.0 - 1 as float))"
    val dup = expr(
      "transform(sequence(0, 63), i -> " +
        "cast(pmod(xxhash64(-1L, i), 2000001) / 1000000.0 - 1 as float))")
    def batchDf(batchId: Int): DataFrame =
      spark.range(batchRows)
        .select((col("id") + 10000000L + batchId.toLong * batchRows)
          .as("vec_id"))
        .select(col("vec_id"),
          when(pmod(col("vec_id"), lit(100)) < dupPct, dup)
            .otherwise(expr(hashEmb("vec_id"))).as("embedding"))

    // UNDERSIZED banding: 6×8 (256 buckets/band) — right for ~50k,
    // wrong for the ~400k this run grows to. Seed includes the
    // planted-dup vector (ComposedProbe's cold-start lesson).
    val (bands0, bits0) = (6, 8)
    val seed = spark.range(5000).select(col("id").as("vec_id"),
        expr(hashEmb("id")).as("embedding"))
      .unionByName(spark.range(1).select(lit(5000L).as("vec_id"),
        dup.as("embedding")))
    graft.etl.DedupIngest.admitBatchEmbedding(spark, seed, corpusDir,
      batchId = -1L, bands = bands0, bitsPerBand = bits0, runTag = "grow")

    def admit(i: Int, bands: Int, bits: Int, tag: String,
              buckets: Int): Long = {
      val t0 = System.nanoTime()
      graft.etl.DedupIngest.admitBatchEmbedding(spark, batchDf(i), corpusDir,
        batchId = i.toLong, bands = bands, bitsPerBand = bits,
        runTag = tag, stateBuckets = buckets)
      (System.nanoTime() - t0) / 1000000L
    }

    val grow = (0 until growBatches).map { i =>
      val ms = admit(i, bands0, bits0, "grow", 0)
      val n = spark.read.parquet(corpusDir).count()
      System.err.println(s"[reband] grow batch $i wall=${ms}ms corpus=$n")
      s"""{"batch":$i,"wall_ms":$ms,"corpus_rows_after":$n}"""
    }
    val corpusN = spark.read.parquet(corpusDir).count()

    // the BEFORE leg: one more batch at the outgrown banding
    val beforeMs = admit(growBatches, bands0, bits0, "grow", 0)

    // reband to target-sized banding + the bucketed layout
    val t0 = System.nanoTime()
    val (bands1, bits1) = graft.etl.DedupIngest.rebandCorpus(spark,
      corpusDir, targetN = corpusN, stateBuckets = 32)
    val rebandMs = (System.nanoTime() - t0) / 1000000L

    // the AFTER leg: the same batch SHAPE against the same corpus
    // (fresh ids so admission work is comparable, not cache replay)
    val afterMs = admit(growBatches + 1, bands1, bits1, "grow", 32)

    println(s"""{"metric":"reband_probe","batch_rows":$batchRows,""" +
      s""""dup_pct":$dupPct,"cpus":$cpus,""" +
      s""""banding_before":[$bands0,$bits0],"banding_after":[$bands1,$bits1],""" +
      s""""corpus_rows":$corpusN,"grow":[${grow.mkString(",")}],""" +
      s""""trigger_ms_before":$beforeMs,"trigger_ms_after":$afterMs,""" +
      s""""reband_ms":$rebandMs,""" +
      s""""speedup":${beforeMs.toDouble / math.max(1L, afterMs)}}""")
    spark.stop()
  }
}
