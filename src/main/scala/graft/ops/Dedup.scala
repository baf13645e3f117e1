package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (north-star surface,
  * SURVEY.md §2.11): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale posture: every near-dup variant avoids the O(n²) all-pairs
  * join — candidates come from an equi-join on a blocking key
  * (LSH band bucket / SimHash chunk / (lang, length-bucket) block),
  * which Spark executes as a hash-partitioned shuffle join whose cost
  * is Σ bucket², not n². Hot buckets are split by AQE skew-join.
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct key tuple.
    * `dropDuplicates` = hash-aggregate on the key columns with
    * map-side partial aggregation — one shuffle of the distinct keys,
    * not the full data.
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  // ---------------------------------------------------------------- //
  // MinHash + LSH                                                    //
  // ---------------------------------------------------------------- //

  private val MersennePrime = 2147483647L // 2^31-1; keeps a*x+b < 2^62 (no overflow under ANSI)

  /** k universal-hash coefficient pairs from a fixed seed —
    * deterministic across runs/clusters.
    */
  private def hashCoeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + math.abs(rnd.nextLong()) % (MersennePrime - 1),
                 math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** (doc_id, distinct word-shingle) pairs — the exploded set both the
    * signature pass and the verify pass reuse.
    */
  private def shingles(docs: DataFrame, shingleSize: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val sh =
      if (shingleSize <= 1) array_distinct(toks)
      else array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - shingleSize, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(shingleSize)))
        ))
    docs.select(col("doc_id"), explode(sh).as("shingle"))
  }

  /** MinHash signatures: one row per doc, columns h0..h(k-1).
    * Single explode + single hash-aggregate: the shuffle carries only
    * (doc_id, k longs), never the shingle sets.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 64, shingleSize: Int = 3,
                        seed: Long = 42L): DataFrame = {
    val ex = shingles(docs, shingleSize)
      .withColumn("x", pmod(xxhash64(col("shingle")), lit(MersennePrime)))
    val aggs = hashCoeffs(k, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(MersennePrime))).as(s"h$i")
    }
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Near-duplicate pairs via banded LSH over MinHash signatures,
    * verified with true shingle-set Jaccard.
    *
    * bands × rowsPerBand = k. A pair collides in ≥1 band with
    * probability 1-(1-j^r)^b (the S-curve) — candidates ≪ n², then the
    * exact Jaccard join filters false positives.
    */
  def minhashNearDups(docs: DataFrame, k: Int = 64, bands: Int = 16,
                      shingleSize: Int = 3, threshold: Double = 0.5,
                      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // ONE explode + ONE aggregation produces both the k-min signature
    // and the exact shingle set used by the verify join — the shingle
    // stream is shuffled once, not twice.
    val ex = shingles(docs, shingleSize)
      .withColumn("x", pmod(xxhash64(col("shingle")), lit(MersennePrime)))
    val aggs = hashCoeffs(k, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(MersennePrime))).as(s"h$i")
    } :+ collect_set(col("shingle")).as("sh")
    val sigs = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandKeys = (0 until bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(j => col(s"h$j")): _*)
    }
    // band rows stay narrow (no shingle sets) so the self-join only
    // shuffles (doc_id, band, key)
    val bandRows = sigs.select(
      col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "key"))
    )
    val cand = bandRows.alias("l")
      .join(bandRows.alias("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .distinct()
    // verify candidates with exact Jaccard over distinct shingle sets
    val sets = sigs.select(col("doc_id"), col("sh"))
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- //
  // SimHash                                                          //
  // ---------------------------------------------------------------- //

  /** 64-bit SimHash per document: sign-sum of token-hash bits. One
    * explode + one aggregate, like MinHash.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val summed = ex.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)  // disjoint bits: sum == bitwise OR, no overflow
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * the 4×16-bit chunk trick: any pair within distance 3 shares at
    * least one exact chunk (pigeonhole), so candidates come from 4
    * equi-joins on chunk value — no all-pairs scan.
    */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sig = simhash(docs)
    val chunks = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "val")))
    chunks.alias("l")
      .join(chunks.alias("r"),
        col("l.chunk") === col("r.chunk") && col("l.val") === col("r.val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---------------------------------------------------------------- //
  // N-gram Jaccard (oracle-expressible near-dup)                     //
  // ---------------------------------------------------------------- //

  /** Token-set Jaccard over pairs blocked on (lang, length bucket):
    * near-dups necessarily agree on language and approximate length,
    * so the equi-join block bounds the pair count. Fully expressible
    * in ANSI SQL → DuckDB-oracle checkable.
    */
  def ngramJaccardPairs(docs: DataFrame, lenBucket: Int = 20,
                        threshold: Double = 0.5): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("lang"),
      (col("n_chars") / lenBucket).cast("long").as("len_bkt"),
      array_distinct(split(col("text"), " ")).as("toks"))
    base.alias("l")
      .join(base.alias("r"),
        col("l.lang") === col("r.lang") && col("l.len_bkt") === col("r.len_bkt") &&
          col("l.doc_id") < col("r.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("l.toks"), col("r.toks"))).cast("double") /
          size(array_union(col("l.toks"), col("r.toks"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- //
  // Embedding cosine near-dup                                        //
  // ---------------------------------------------------------------- //

  /** Embedding near-dup pairs: cosine ≥ threshold within a blocking
    * key (here the fixture's `label`; in production an LSH bucket or
    * coarse-quantizer cell). Norms are precomputed once per row so the
    * pair loop is a single fused dot product.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.5): DataFrame = {
    import graft.functions.VectorFunctions._
    val base = embeddings.select(
      col("vec_id"), col("label"), col("embedding"),
      normD(col("embedding")).as("nrm"))
    base.alias("l")
      .join(base.alias("r"),
        col("l.label") === col("r.label") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cosine",
        dotD(col("l.embedding"), col("r.embedding")) / (col("l.nrm") * col("r.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
