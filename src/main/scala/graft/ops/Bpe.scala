package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword learning and segmentation (Sennrich et
  * al. 2016) — the tokenizer-training primitive a corpus pipeline
  * runs after cleaning/dedup (the catalog's `ext_token_count` counts
  * by a FIXED BPE-ish regex; this LEARNS the merge table).
  *
  * Representation: a word's symbol sequence is a SENTINEL-JOINED
  * string `␁a␁b␁c␁` (U+0001 between and around symbols — absent from
  * text by contract, guarded in [[learn]]). Applying merge (a,b) is a
  * LEFT FOLD over the symbol list with the string as accumulator:
  * when the accumulator ends with `␁a␁` and the next symbol is `b`,
  * the tail rewrites to `␁ab␁`; otherwise the symbol appends. This is
  * the exact reference BPE application — consecutive occurrences all
  * merge (`bdbd` → `bd·bd`), a freshly fused symbol never re-matches
  * (`aaa` under (a,a) → `aa·a`), and a pattern can never fire inside
  * a multi-char symbol. (A plain string `replace ␁a␁b␁ → ␁ab␁` was
  * measured WRONG here: consecutive occurrences share a boundary
  * sentinel, which the first match consumes, so `bdbd` merged only
  * once; regex look-arounds would fix it but DuckDB's RE2 has none.)
  * The same fold runs verbatim in SQL — Spark `aggregate`, DuckDB
  * `list_reduce` with a prepended init — so segmentation is exactly
  * SQL-replicable: the catalog oracle (`ext_bpe_segment`) is a full
  * hash match, not a contract.
  *
  * Learning runs on the distinct-WORD vocabulary with counts — one
  * corpus pass total, then per-round work is proportional to the
  * vocabulary, not the corpus (the standard trainer shape: at 100 TB
  * the corpus has ~10⁸ word types but ~10¹¹ tokens). Each round is
  * one distributed pair-count aggregation + a 1-row argmax collect;
  * ties break deterministically (count desc, then pair
  * lexicographically) so the merge table is reproducible anywhere.
  * Merges apply to words in LEARNED ORDER (the subword-nmt
  * convention), keeping segmentation a pure fold chain.
  */
object Bpe {

  val Sep = "\u0001"

  /** word → `␁w␁o␁r␁d␁` (split("") yields single chars). */
  private[graft] def symbolize(word: Column): Column =
    concat(lit(Sep), array_join(split(word, ""), Sep), lit(Sep))

  /** Sentinel string → symbol array. Drops the empty head/tail that
    * splitting the wrapped form produces; intermediate symbols are
    * never empty (they concatenate word characters). Built to
    * reference `sym` exactly ONCE: the merge chain folds this into
    * itself per round, so a second reference would double the
    * expression tree per merge (2^k blowup by merge k).
    */
  private[graft] def resplit(sym: Column): Column =
    filter(split(sym, Sep), s => s =!= "")

  /** Trim width of symbol `a` in CHARACTERS (code points): Spark's
    * `length`/`substr` and DuckDB's `length`/`substr` both count code
    * points, while `String.length` counts UTF-16 units — a merge
    * symbol containing a supplementary (non-BMP) character would trim
    * one character too many under `a.length`. */
  private def charLen(a: String): Int = a.codePointCount(0, a.length)

  /** One merge as the accumulator fold described in the object doc. */
  private def foldMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, lit(Sep), (acc, x) =>
      when(x === lit(b) && endswith(acc, lit(Sep + a + Sep)),
        concat(acc.substr(lit(1), length(acc) - (charLen(a) + 1)),
          lit(a + b + Sep)))
        .otherwise(concat(acc, x, lit(Sep))))

  /** Chain of merge folds in learned order: sentinel string in,
    * sentinel string out. */
  private[graft] def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (a, b)) => foldMerge(resplit(c), a, b) }

  /** Learn `nMerges` merges from the corpus. One corpus pass builds
    * the (word, count) vocabulary; each round counts adjacent symbol
    * pairs (weighted by word count), collects the single best pair,
    * and applies it vocabulary-wide. The vocabulary frame is
    * re-materialized per round (`localCheckpoint`) so lineage — one
    * replace per learned merge — never compounds into the next
    * round's aggregation. Stops early when no pair reaches
    * `minCount`.
    */
  def learn(docs: DataFrame, textCol: String = "text", nMerges: Int = 16,
            minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    var vocab = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .filter(!col("w").contains(Sep)) // sentinel guard: such a word would corrupt its own symbol string
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(symbolize(col("w")).as("s"), col("cnt"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      // adjacent pairs of the CURRENT symbolization, weighted by count
      val withSyms = vocab.withColumn("_sy",
        expr(s"slice(split(s, '$Sep'), 2, size(split(s, '$Sep')) - 2)"))
      val best = withSyms
        .select(col("cnt"), col("_sy"),
          posexplode(expr("slice(_sy, 1, size(_sy) - 1)")).as(Seq("i", "a")))
        .withColumn("b", expr("element_at(_sy, i + 2)"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) exhausted = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        vocab = vocab
          .withColumn("s", applyMerges(col("s"), Seq((a, b))))
          .localCheckpoint()
        rounds += 1
      }
    }
    merges.toSeq
  }

  /** The merge table [[learn]] produces on the sf0.01 documents
    * fixture (nMerges=10, minCount=2) — frozen as the catalog's fixed
    * table so `ext_bpe_segment`'s oracle SQL is scale-independent;
    * `BpeSpec` re-learns it from the fixture to pin the literal.
    */
  val FixtureMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"))

  /** Segment every word of `textCol` with a FIXED merge table:
    * per-word symbol lists joined by spaces, words by " | ", plus the
    * total symbol count (derived FROM the rendered text so both
    * engines count the same thing). The rendering runs as ONE codegen
    * expression per row (functions.BpeSegmentExpr — 8.9-14.6× over the
    * fold-through-higher-order-functions twin below, which stays as
    * the semantics anchor: `BpeSpec` pins bit-equality between the
    * two, and the DuckDB oracle runs the fold shape).
    */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
              textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    docs.select(col("doc_id"),
      toCol(graft.functions.BpeSegmentExpr(merges, toExpr(col(textCol))))
        .as("bpe_text"))
      .withColumn("n_bpe_tokens",
        size(filter(split(col("bpe_text"), " "), t => t =!= "|")).cast("long"))
  }

  /** The declarative twin of [[segment]]: per-merge accumulator folds
    * through `transform`/`aggregate` — pure built-in operations, the
    * exact shape the DuckDB oracle runs ([[segmentOracleSql]]).
    * Higher-order functions are CodegenFallback, so this evaluates
    * interpreted per element; it exists as the cross-engine semantics
    * anchor, not the hot path.
    */
  def segmentFold(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text"): DataFrame = {
    val perWord = transform(split(col(textCol), " "),
      w => applyMerges(symbolize(w), merges))
    docs.select(col("doc_id"),
      array_join(transform(perWord, s =>
        trim(replace(s, lit(Sep), lit(" ")))), " | ").as("bpe_text"))
      .withColumn("n_bpe_tokens",
        size(filter(split(col("bpe_text"), " "), t => t =!= "|")).cast("long"))
  }

  /** DuckDB twin of [[segment]] for the catalog oracle: the same
    * symbolize + fold chain, generated as SQL text (the same
    * literal-embedding pattern as the langid oracle). Like the Spark
    * side, each round references its predecessor exactly once, so the
    * generated SQL grows linearly in the merge count.
    */
  def segmentOracleSql(merges: Seq[(String, String)]): String = {
    // merge symbols come from arbitrary corpus words — escape quotes
    // so a symbol containing `'` cannot produce malformed SQL, and
    // count trim widths in code points (DuckDB's length() counts
    // characters; String.length counts UTF-16 units — see charLen)
    def q(s: String): String = s.replace("'", "''")
    // sentinel STRING per round; a round wraps its predecessor into
    // (init :: symbols) and folds the merge over it
    val folded = merges.foldLeft(
      "chr(1) || array_to_string(string_split(w, ''), chr(1)) || chr(1)") {
      case (prev, (a, b)) =>
        s"list_reduce(list_prepend(chr(1), " +
          s"list_filter(string_split($prev, chr(1)), s -> s <> '')), " +
          s"(acc, x) -> CASE WHEN x = '${q(b)}' AND ends_with(acc, chr(1)||'${q(a)}'||chr(1)) " +
          s"THEN substr(acc, 1, length(acc) - ${charLen(a) + 1}) || '${q(a)}${q(b)}' || chr(1) " +
          s"ELSE acc || x || chr(1) END)"
    }
    s"""WITH seg AS (
       |  SELECT doc_id, array_to_string(list_transform(string_split(text, ' '),
       |           w -> trim(replace($folded, chr(1), ' '))), ' | ') AS bpe_text
       |  FROM documents)
       |SELECT doc_id, bpe_text,
       |       CAST(len(list_filter(string_split(bpe_text, ' '), t -> t <> '|')) AS BIGINT)
       |         AS n_bpe_tokens
       |FROM seg""".stripMargin
  }
}
