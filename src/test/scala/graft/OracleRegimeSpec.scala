package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `SparkEntry.oracleSqlForCounts` — the pure regime logic that
  * decides, from the two fixture cardinalities alone, which oracle
  * entries are REGENERATED (adaptive LSH bits / ANN banding baked into
  * the SQL literals) or DROPPED to rows-only (profiler NDV sketch
  * regime). The end-to-end validations ran against DuckDB (SCALE.md:
  * both LSH entries hash-match at sf5 / 11 bits, the ANN pair set at
  * sf1 / 8×7); this spec keeps every regime BOUNDARY from drifting
  * without multi-GB fixtures.
  */
class OracleRegimeSpec extends AnyFunSuite {

  // fixture cardinalities per sf: embeddings / orders
  private val sf001 = (500L, 15000L)
  private val sf01 = (2000L, 150000L)
  private val sf1 = (20000L, 1500000L)
  private val sf5 = (100000L, 7500000L)
  private val sf25 = (500000L, 37500000L)

  test("every driver gate scale returns oracleSql verbatim") {
    for ((ne, no) <- Seq(sf001, sf01)) {
      assert(SparkEntry.oracleSqlForCounts(ne, no) == SparkEntry.oracleSql,
        s"gate scale ($ne, $no) must not rewrite any oracle")
    }
  }

  test("sf1: only the ANN banding leaves its pinned regime") {
    val m = SparkEntry.oracleSqlForCounts(sf1._1, sf1._2)
    val base = SparkEntry.oracleSql
    // lshBits(20000) == 8 ⇒ LSH entries untouched; annParams ⇒ (8,7)
    assert(m("ext_sim_lsh") == base("ext_sim_lsh"))
    assert(m("ext_sim_lsh_indexed") == base("ext_sim_lsh_indexed"))
    assert(m("ext_dedup_embedding_ann") != base("ext_dedup_embedding_ann"))
    assert(m.contains("ext_profile_columns"), "1.5M orders is exact-NDV regime")
  }

  test("sf5/sf25: LSH + ANN regenerate, profiler drops past the NDV switch") {
    for (((ne, no), dropProfile) <- Seq(sf5 -> false, sf25 -> true)) {
      val m = SparkEntry.oracleSqlForCounts(ne, no)
      val base = SparkEntry.oracleSql
      assert(m("ext_sim_lsh") != base("ext_sim_lsh"))
      assert(m("ext_sim_lsh_indexed") != base("ext_sim_lsh_indexed"))
      assert(m("ext_dedup_embedding_ann") != base("ext_dedup_embedding_ann"))
      assert(m.contains("ext_profile_columns") == !dropProfile,
        s"profiler regime wrong at ($ne, $no)")
      // the regenerated indexed-LSH oracle must carry the SAME
      // probe-budget bound the catalog query computes — the shared
      // lshIndexedQueryBound definition made textual
      val bits = graft.ops.Similarity.lshBits(ne)
      val masks = graft.ops.Similarity.probeMaskCount(bits)
      val bound = math.min(100000L, 50L * (90000 / masks))
      assert(m("ext_sim_lsh_indexed").contains(s"vec_id < $bound"),
        s"indexed-LSH oracle bound drifted at ($ne, $no)")
      // the delta twin's index covers HALF the corpus, so its bound
      // follows lshBits(n/2) — at the entry's shared constant radius
      // (lshDeltaProbeDist = 3; the regime-derived alternative was
      // measured and refuted, see its scaladoc)
      val bitsHalf = graft.ops.Similarity.lshBits(ne / 2)
      val masksHalf = graft.ops.Similarity.probeMaskCount(bitsHalf,
        graft.ops.Similarity.lshDeltaProbeDist)
      val boundHalf = math.min(100000L, 50L * (90000 / masksHalf))
      assert(m("ext_sim_lsh_delta").contains(s"vec_id < $boundHalf"),
        s"delta-LSH oracle bound drifted at ($ne, $no)")
      // the FILTERED probe's bound follows the MAX radius's mask
      // count (worst-case all-starved escalation, radius 3)
      val masksF = graft.ops.Similarity.probeMaskCount(bits, 3)
      val boundF = math.min(100000L, 50L * (90000 / masksF))
      assert(m("ext_sim_filtered_lsh") != base("ext_sim_filtered_lsh"))
      assert(m("ext_sim_filtered_lsh").contains(s"vec_id < $boundF"),
        s"filtered-LSH oracle bound drifted at ($ne, $no)")
    }
  }

  test("regenerated oracles differ only where the regime says they should") {
    val m = SparkEntry.oracleSqlForCounts(sf25._1, sf25._2)
    val base = SparkEntry.oracleSql
    val changed = base.keySet.filter(k => m.get(k) != base.get(k))
    assert(changed == Set("ext_sim_lsh", "ext_sim_lsh_indexed",
      "ext_sim_lsh_delta", "ext_sim_filtered_lsh",
      "ext_dedup_embedding_ann", "ext_profile_columns"),
      s"unexpected oracle rewrites: $changed")
  }
}
