#!/usr/bin/env python3
"""Generate SCALE.md's 100 TB capacity sheet from the bench artifacts.

Usage: python3 tools/mkcapacity.py <round> [--write]

For each operator family a cluster operator would size for, reads the
representative query's sf1/sf25 timings from tools/bench_sf1_r<N>.json
and bench_sf25_r<N>.json, derives the measured exponent, and projects
the wall-clock at 100 TB on a reference cluster — flagging one-time
builds vs steady-state work. Replaces the region between
<!-- mkcapacity:begin --> / <!-- mkcapacity:end --> in SCALE.md with
--write. Machine-derived like tools/mkheadlines.py: every number in
the sheet traces to a committed artifact plus the three stated
assumptions.
"""
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCALE_MD = os.path.join(HERE, "..", "SCALE.md")

# parquet bytes on disk at sf25 — the ratio base for the 100 TB
# projection. Derived from the fixture directory at run time; the
# recorded constant is only a cross-check (r9 ADVICE: a regenerated
# fixture must not silently drift the projection while the sheet
# still claims to be machine-derived) and the fallback when the
# fixture is absent on the machine running the tool.
SF25_DIR = "/tmp/sfdata/sf25"
SF25_BYTES_RECORDED = 5_340_660_433


def _sf25_bytes() -> int:
    if not os.path.isdir(SF25_DIR):
        sys.stderr.write(f"mkcapacity: {SF25_DIR} absent — using recorded "
                         f"constant {SF25_BYTES_RECORDED}\n")
        return SF25_BYTES_RECORDED
    total = 0
    for root, _dirs, files in os.walk(SF25_DIR):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    if abs(total - SF25_BYTES_RECORDED) > 0.01 * SF25_BYTES_RECORDED:
        raise SystemExit(
            f"mkcapacity: sf25 fixture measures {total} bytes but the "
            f"recorded constant is {SF25_BYTES_RECORDED} (>1% drift) — "
            "the fixture was regenerated; update SF25_BYTES_RECORDED "
            "deliberately so the projection base is a reviewed change.")
    return total


SF25_BYTES = _sf25_bytes()
TARGET_BYTES = 100e12
# reference cluster: 1000 executors x 4 cores, vs the 32-core bench box
CLUSTER_CORES = 4000
LOCAL_CORES = 32

# family -> (representative query, one-time?, why this query)
FAMILIES = [
    ("parquet scan + grouped agg", "agg_having", False,
     "fact scan, expression-heavy group-by with HAVING"),
    ("shuffle fact join", "join_shuffle_agg", False,
     "orders x lineitem shuffle join + aggregation"),
    ("multiway star join", "sql_q5_local_supplier", False,
     "TPC-H Q5: dims broadcast-reduced, one fact shuffle"),
    ("window / rank suite", "win_rank_suite", False,
     "two-level distributed rank construction"),
    ("global cumulative sum", "bench_running_sum_fq", False,
     "token-budget prefix sum, two-level distributed cumsum"),
    ("exact dedup", "ext_dedup_exact", False,
     "hash group-by canonical-id dedup"),
    ("MinHash near-dup", "ext_dedup_minhash", False,
     "shingle -> minhash -> banded LSH equi-join"),
    ("embedding near-dup (ANN)", "ext_dedup_embedding_ann", False,
     "banded sign-LSH blocking + exact cosine verify"),
    ("semantic dedup (contract cfg)", "bench_dedup_semantic_rc_fq", False,
     "hybrid cell+LSH multi-seed pass at theta=0.6 (bounded-slice probe)"),
    ("ANN probe (persisted IVF-PQ)", "bench_sim_ivfpq_indexed_fq", False,
     "cell-pruned ADC scan + exact rerank, fixed query set"),
    ("ANN index build (IVF-PQ)", "bench_sim_ivfpq_build_fq", True,
     "kmeans + codebooks + partitioned write"),
    ("ANN index append (frozen model)", "bench_sim_ivfpq_append_fq", True,
     "per-batch O(batch) segment append"),
    ("text quality / language-id", "ext_text_quality", False,
     "single-scan per-document feature extraction"),
    ("column profiler", "ext_profile_columns", False,
     "per-column stats + size-switched NDV"),
]


def main() -> int:
    rnd = int(sys.argv[1])
    with open(os.path.join(HERE, f"bench_sf1_r{rnd}.json")) as f:
        q1 = json.load(f)["queries"]
    with open(os.path.join(HERE, f"bench_sf25_r{rnd}.json")) as f:
        q25 = json.load(f)["queries"]
    ratio = TARGET_BYTES / SF25_BYTES
    speedup = CLUSTER_CORES / LOCAL_CORES
    out = []
    out.append(f"### 100 TB capacity sheet — round {rnd} "
               f"(derived by tools/mkcapacity.py from tools/bench_sf1_r{rnd}.json "
               f"/ bench_sf25_r{rnd}.json)")
    out.append("")
    out.append(f"Projection basis: sf25 fixture = {SF25_BYTES / 1e9:.1f} GB "
               f"parquet on disk, so 100 TB is **{ratio:,.0f}x** the "
               f"measured data; reference cluster = 1000 executors x 4 "
               f"cores = {CLUSTER_CORES} cores, {speedup:.0f}x the "
               f"{LOCAL_CORES}-thread bench box. Two projections per "
               "family: *linear* assumes cost grows with bytes "
               "(conservative for every steady-state scan/shuffle); "
               "*measured-exp* extends the observed sf1->sf25 exponent "
               "(honest only where the sublinearity is structural — "
               "bounded probes, partition pruning, fixed-work slices — "
               "noted per row).")
    out.append("")
    out.append("| family (representative query) | sf25 wall | exp sf1→sf25 "
               "| 100 TB linear | 100 TB measured-exp | kind |")
    out.append("|---|---|---|---|---|---|")
    for fam, q, onetime, _why in FAMILIES:
        if q not in q25:
            out.append(f"| {fam} (`{q}`) | — not in sf25 artifact | | | | |")
            continue
        t25 = q25[q]
        e = (math.log(t25 / q1[q]) / math.log(25.0)
             if q in q1 and q1[q] > 0 else float("nan"))
        lin = t25 * ratio / speedup
        byexp = (t25 * (ratio ** e) / speedup
                 if not math.isnan(e) else float("nan"))
        def human(s):
            if math.isnan(s):
                return "—"
            if s < 90:
                return f"{s:.0f} s"
            if s < 5400:
                return f"{s / 60:.0f} min"
            return f"{s / 3600:.1f} h"
        kind = "ONE-TIME" if onetime else "steady-state"
        out.append(f"| {fam} (`{q}`) | {t25:.1f} s | "
                   + (f"{e:.2f}" if not math.isnan(e) else "—")
                   + f" | {human(lin)} | {human(byexp)} | {kind} |")
    out.append("")
    out.append("Assumptions the sheet rests on (all three must hold):")
    out.append("1. **Per-core throughput parity** — a cluster core sustains "
               "the bench box's per-core scan/shuffle rate (same storage "
               "bandwidth per core; object-store reads need the usual "
               "prefetch tuning to match local NVMe).")
    out.append("2. **Linear strong scaling to 4000 cores** — every family "
               "here shuffles on data-proportional keys or runs "
               "embarrassingly parallel scans; no driver-side loop, no "
               "single-partition window (the two-level cumsum/rank "
               "constructions exist precisely to keep this true), so "
               "parallel efficiency is bounded by shuffle fabric, not "
               "algorithm shape. AQE re-sizes reduce widths from table "
               "statistics (`GraftSession.tuneFor`'s rule).")
    out.append("3. **Exponent transfer** — the measured-exp column assumes "
               "the sf1→sf25 exponent's cause (bucketed/banded candidate "
               "bounding, partition pruning, bounded contract slices) "
               "still binds at 18,700x; for families whose exponent "
               "reflects a FIXED-WORK slice (the `_fq` probes, the "
               "bounded semantic-contract probe) the linear column is "
               "the honest steady-state bound and measured-exp applies "
               "to the probe workload itself.")
    out.append("")
    out.append("One-time rows (index build/append) amortize across every "
               "query served; steady-state rows are the recurring cost "
               "per full-corpus pass. ANN probe cost scales with the "
               "QUERY set and probed cells, not the corpus — its 100 TB "
               "column is per fixed query batch.")
    block = "\n".join(out)
    print(block)
    if "--write" in sys.argv:
        import re
        with open(SCALE_MD) as f:
            text = f.read()
        begin, end = "<!-- mkcapacity:begin -->", "<!-- mkcapacity:end -->"
        pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
        if not pat.search(text):
            raise SystemExit("mkcapacity markers not found in SCALE.md")
        text = pat.sub(lambda _m: begin + "\n" + block + "\n" + end, text)
        with open(SCALE_MD, "w") as f:
            f.write(text)
        print("\nSCALE.md updated.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
