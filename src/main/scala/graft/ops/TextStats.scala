package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over the `documents`
  * table (north-star surface, SURVEY.md §2.11): token statistics,
  * quality scoring, language ID, content fingerprinting.
  *
  * Everything is built from codegen'd string/array built-ins — per-row,
  * shuffle-free, embarrassingly parallel: at 100 TB these run at scan
  * speed with full column pruning (only `doc_id`+`text` are read).
  */
object TextStats {

  /** Whitespace tokenization (the fixture corpus is single-space
    * separated; a BPE-ish regex variant is [[tokensRegex]]).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex "BPE-ish" tokenization: words, numbers, or single
    * non-space symbols — closer to what a real tokenizer counts.
    */
  def tokensRegex(text: Column): Column =
    // regexp_extract_all returns every match of the class below
    expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)")

  /** Stopword list — intersects the fixture vocabulary; used for the
    * stopword-ratio quality signal.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document token statistics: counts, distinct counts, summed
    * token length, mean token length.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
        .as("token_chars")
    )
  }

  /** Quality scoring: stopword ratio, type–token ratio, mean word
    * length — the length/stopword heuristics used to filter web text.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks   = tokens(col("text"))
    val nTok   = size(toks).cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop  = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val nDist  = size(array_distinct(toks)).cast("double")
    val tokChars = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
    docs.select(
      col("doc_id"),
      round(nStop / nTok, 6).as("stop_ratio"),
      round(nDist / nTok, 6).as("ttr"),
      round(tokChars.cast("double") / nTok, 6).as("mean_tok_len"),
      (nTok >= 20 && nDist / nTok > 0.3).as("passes_quality")
    )
  }

  /** Deterministic document fingerprint: polynomial rolling hash over
    * per-token codes (length·256 + first-char codepoint), mod 1e9+7.
    * Oracle-reproducible (plain integer arithmetic, no engine-specific
    * hash), collision-tolerant enough for exact-dup candidate keying.
    * For a stronger content key use `ops.Dedup.simhash` / the sha256
    * in `ops.Multimodal.mediaStats`.
    */
  def fingerprint(text: Column): Column = {
    val tokCodes = transform(tokens(text), t => (length(t).cast("long") * 256 + ascii(t)))
    aggregate(tokCodes, lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)
  }

  /** Language ID by stopword-profile scoring: count marker-token hits
    * per language, argmax with deterministic tiebreak on language code.
    * (An n-gram heuristic classifier; the fixture's `lang` column is a
    * synthetic label, so accuracy vs. that label is not the contract —
    * determinism is.)
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "de", "et"),
    "zh" -> Seq("的", "是", "了", "在")
  )

  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(size(filter(toks, t => array_contains(arr, t))).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, ties → max lang code
    docs.select(
      col("doc_id"),
      array_max(array(scored: _*)).getField("lang").as("pred_lang")
    )
  }

  /** PII-style scrub patterns, shared by the Spark op and the DuckDB
    * oracle (Java regex ∩ RE2 dialect — no backrefs/lookaround). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumberRe: String = "[0-9]+"

  /** Redact email addresses and digit runs from a text column —
    * the scrub pass a pipeline runs over raw payloads before they
    * may enter a training corpus. Emails are folded first so their
    * digits are not double-counted; `n_redactions` is the audit
    * count per row. Per-row regex work inside codegen, scan speed,
    * no shuffle.
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emailScrubbed = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    df.select(
      col(idCol),
      regexp_replace(emailScrubbed, NumberRe, "<NUM>").as("scrubbed"),
      (regexp_count(col(textCol), lit(EmailRe)) +
        regexp_count(emailScrubbed, lit(NumberRe))).cast("long").as("n_redactions"))
  }

  /** Within-document repetition signals (the Gopher-style quality
    * gates): share of the most frequent token and the duplicate-token
    * ratio. Relational two-level aggregation — explode inflates rows
    * but map-side partial aggregation collapses (doc, token) counts
    * before the shuffle, so the exchanged volume is the distinct
    * (doc, token) set, not the token stream.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val perTok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    perTok.groupBy("doc_id").agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(
        col("doc_id"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 6).as("top_share"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_ratio"))
  }

  /** Deterministic sequence packing: documents are laid out in
    * doc_id order within each `source` shard and cut into training
    * chunks of `budget` tokens by cumulative offset — the step that
    * turns a cleaned corpus into fixed-size context windows. One
    * window prefix-sum per shard (a single hash-partition exchange);
    * chunk boundaries are pure integer arithmetic, reproducible on
    * any cluster layout.
    */
  def packChunks(docs: DataFrame, budget: Int): DataFrame =
    // cumulative offsets via the DISTRIBUTED grouped running sum: a
    // plain Window partitioned on `source` runs one task per source
    // (~5 at any scale — the rank-suite wall, hidden in an ext op);
    // the two-level form engages above 2M rows, the gate scales keep
    // the plain-Window plan the oracle pins (Ranks size switch).
    // offset = exclusive prefix = inclusive run_sum − own tokens.
    Ranks.totalOrderRunningSum(
        docs.select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tokens")),
        Seq("source"), "doc_id", "doc_id", "n_tokens")
      .withColumn("offset", col("run_sum") - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("offset"),
        expr(s"offset div $budget").as("chunk_id"))

  /** Per-document sliding-window chunking with overlap (the RAG /
    * long-context prep step, vs [[packChunks]]'s cross-document
    * packing): chunk starts every `stride` tokens while inside the
    * document, each chunk spanning up to `size` tokens, so successive
    * chunks share `size - stride` tokens of context. Pure projection +
    * generator — no shuffle at all, no state: chunking parallelizes
    * embarrassingly over documents at any scale. Output one row per
    * chunk: (doc_id, chunk_idx, tok_start, tok_len).
    */
  def chunkOverlap(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(tokens(col("text"))).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1L, lit(stride.toLong)))
          .as("tok_start"))
      .select(col("doc_id"),
        expr(s"tok_start div $stride").as("chunk_idx"),
        col("tok_start"),
        least(lit(size.toLong), col("n_tokens") - col("tok_start")).as("tok_len"))
  }

  /** Corpus-LM quality tiers (the CCNet-style signal: score every
    * document under a language model trained on the corpus itself,
    * then bucket — fluent text lands in the head tier, gibberish in
    * the tail). The model is an add-1-smoothed bigram LM; a document
    * scores the MEAN smoothed bigram likelihood, accumulated in
    * integer micro-units: `floor(1e9 · (c12+1)/(c1+V))` per bigram
    * occurrence. Log-free on purpose — IEEE multiply/divide/floor are
    * correctly rounded and bit-identical across engines, while libm
    * `ln`/`log2` differ in the last ulp (the mean-likelihood score is
    * a monotone quality proxy for per-doc perplexity under the
    * mean↔geomean swap; integer accumulation makes the oracle exact
    * and partition-order-free).
    *
    * Shape: bigram OCCURRENCES join their corpus counts on the
    * (w1, w2) key — deliberately NOT pre-aggregated to
    * (doc_id, w1, w2, cnt) first. That rewrite (suggested r10, since
    * the per-occurrence micro score is constant per (w1, w2)) was
    * implemented and MEASURED in r11: the per-doc bigram repetition
    * factor is 1.04 on this corpus shape (265,704 occurrences →
    * 256,477 distinct doc-bigrams at sf0.1 — a 10-100-word document
    * rarely repeats a bigram), so the probe side shrank 3.6 % while
    * the grouping added a full extra exchange on (doc_id, w1, w2),
    * and the gate wall went 1.6 → 2.5 s. Reverted on the
    * measurement; the join stays a shuffle join on (w1, w2) as the
    * bigram vocabulary outgrows any broadcast at corpus scale (AQE
    * downgrades it to broadcast when c2 is actually small); per-doc
    * rollup is one partial-agg shuffle on doc_id. The final
    * tiering runs
    * over ONE ROW PER DOCUMENT (corpus-scale inputs reduced first)
    * through [[Ranks.totalOrderRankSuite]] — the size-switched
    * two-level construction, so past its threshold the global ntile
    * is bucketed local ranks + broadcast prefix offsets (groups ×
    * buckets parallelism with EXACT ntile arithmetic) instead of one
    * task sorting every document; (score desc, doc_id) is the total
    * order the suite requires and the oracle's tiebreak already pins.
    *
    * Output: (doc_id, n_bigrams, like_micro, tier 1..tiers) — docs
    * with < 2 tokens surface with n_bigrams = 0 in the tail tier.
    */
  def lmQualityTiers(docs: DataFrame, tiers: Int = 4,
                     rankBuckets: Int = 0): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "t")))
      .filter(col("t") =!= "")
    val big = tok
      .withColumn("w1", lag(col("t"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("i"))))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("w1"), col("t").as("w2"))
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c2.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = tok.select(countDistinct(col("t")).as("v"))
    val scored = big
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab)) // 1-row aggregate
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(lit(1e9) * (col("c12") + 1) / (col("c1") + col("v")))
          .cast("long")).as("like_micro"))
    val perDoc = docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("like_micro"), lit(0L)).as("like_micro"))
    Ranks.totalOrderRankSuite(
        perDoc.withColumn("_score", col("like_micro").cast("double") /
          greatest(col("n_bigrams"), lit(1L))),
        partCols = Seq.empty, orderCol = "_score", tieCol = "doc_id",
        ntiles = tiers, desc = true, buckets = rankBuckets)
      .select(col("doc_id"), col("n_bigrams"), col("like_micro"),
        col("quartile").as("tier"))
  }
}
