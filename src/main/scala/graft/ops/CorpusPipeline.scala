package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-corpus admission pipeline, composed from the
  * engine's stage operators in the order a production corpus build
  * applies them (the per-stage queries gate each piece in isolation;
  * this is the end-to-end shape a user of the reference would actually
  * run):
  *
  *   1. quality gate  — length + type-token-ratio + repetition verdict
  *                      (ext_quality_gate's exact thresholds);
  *   2. exact dedup   — keep-first-wins per text among the quality
  *                      survivors (ext_dedup_exact's rule scoped to
  *                      the gated set);
  *   3. decontamination — drop survivors sharing a 5-token shingle
  *                      with the held-out source, Bloom-prefiltered
  *                      scan-side exactly like ext_decontaminate_bloom
  *                      (bit-identical to the exact semi-join — FPs
  *                      are removed by the verify join);
  *   4. split         — deterministic multiplicative-hash train/eval
  *                      assignment (ext_data_split's hash).
  *
  * Every stage is one of the catalog's proven shapes, so the composed
  * plan inherits their 100 TB posture: the gate and dedup are
  * hash-aggregations with map-side partials, decontamination
  * broadcasts only a Bloom bitset (~1.2 bytes/shingle) plus the
  * held-out shingle set for the exact verify, and the split is a
  * stateless projection. Nothing collects to the driver; the
  * composition adds NO shuffle beyond the stages' own.
  */
object CorpusPipeline {

  /** Quality verdict per doc: (doc_id, keep). Thresholds are the
    * catalog gate's: ≥ 20 tokens, type-token ratio > 0.3, top-token
    * share ≤ 8 %.
    */
  private def qualityKeep(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val q = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
    val r = docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_tokens"))
    val topShare = col("top_cnt").cast("double") / col("n_tokens")
    q.join(r, "doc_id")
      .filter(col("n_tok") >= 20 && col("ttr") > 0.3 && topShare <= 0.08)
      .select(col("doc_id"), col("n_tok"))
  }

  private def shingles(df: DataFrame): DataFrame = df
    .withColumn("_ts", split(col("text"), " "))
    .select(col("doc_id"), explode(expr(
      "transform(if(size(_ts) >= 5, sequence(1, size(_ts) - 4), array()), " +
        "i -> concat_ws(' ', slice(_ts, i, 5)))")).as("g"))

  /** Run the pipeline. Output: one row per ADMITTED doc —
    * (doc_id, lang, source, n_tok, split). The held-out benchmark is
    * `benchSource` in its entirety (an eval set is external: its own
    * quality is irrelevant to contamination), and its docs are never
    * part of the corpus.
    */
  def prep(docs: DataFrame, benchSource: String = "src0"): DataFrame = {
    // 1. quality gate
    val gated = docs.join(qualityKeep(docs), "doc_id")

    // 2. exact dedup among survivors: keep-first-wins per text.
    //    min(doc_id) per text is a partial-agg shuffle of one row per
    //    distinct text; the semi-join back keeps only canonicals.
    val canon = gated.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = gated.join(canon, Seq("doc_id"), "left_semi")

    // 3. decontamination of the surviving corpus against the held-out
    //    source: Bloom prefilter scan-side, exact semi-join verify
    //    (bit-identical to the unfiltered plan — see
    //    ext_decontaminate_bloom).
    val bench = shingles(docs.filter(col("source") === benchSource))
      .select("g").distinct()
    val benchHashes = bench.select(xxhash64(col("g")).as("h"))
    val blob = graft.functions.Bloom.build(
      benchHashes, "h", benchHashes.count(), fpp = 0.01)
    val corpus = deduped.filter(col("source") =!= benchSource)
    val bad = shingles(corpus)
      .filter(graft.functions.Bloom.mightContain(blob, xxhash64(col("g"))))
      .join(broadcast(bench), Seq("g"), "left_semi")
      .select("doc_id").distinct()
    val clean = corpus.join(bad, Seq("doc_id"), "left_anti")

    // 4. deterministic split
    clean.select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
      when((col("doc_id") * 2654435761L) % 100 < 90, "train")
        .otherwise("eval").as("split"))
  }
}
