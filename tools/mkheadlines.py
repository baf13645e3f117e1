#!/usr/bin/env python3
"""Regenerate SCALE.md's headline block from the shipped bench artifacts.

Usage:
  python3 tools/mkheadlines.py <round> [--prev N] [--write]

Reads tools/bench_sf01_r<N>.json / bench_sf1_r<N>.json /
bench_sf5_r<N>.json / bench_sf25_r<N>.json (whichever exist), the
previous round's artifacts for shared-query comparisons, and
bench_sf01_r3.json as the sf0.1 steady-state baseline. Emits a
markdown headline block plus the per-query table, every number derived
from the committed jsons — nothing hand-typed. With --write, replaces
the region between the markers in SCALE.md:

    <!-- mkheadlines:begin -->
    ...
    <!-- mkheadlines:end -->

(and likewise mkqueries:begin/end for the table). Exists because
rounds 7 and 8 each shipped one prose number a recorded artifact
contradicted (r7: a recall claim; r8: the sf0.1 headline said -4%
where the artifact summed to +14%) — the doc must derive from the
artifact, not prose memory.
"""
import json
import math
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCALE_MD = os.path.join(HERE, "..", "SCALE.md")
SFS = [("sf0.1", "sf01"), ("sf1", "sf1"), ("sf5", "sf5"), ("sf25", "sf25")]


def load(tag: str, rnd: int):
    p = os.path.join(HERE, f"bench_{tag}_r{rnd}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def shared_sum(cur: dict, prev: dict):
    if cur is None or prev is None:
        return None
    shared = set(cur["queries"]) & set(prev["queries"])
    return (sum(cur["queries"][q] for q in shared),
            sum(prev["queries"][q] for q in shared), len(shared))


def fmt(x: float) -> str:
    return f"{x:.1f}"


def headlines(rnd: int, prev_rnd: int) -> str:
    cur = {sf: load(tag, rnd) for sf, tag in SFS}
    prev = {sf: load(tag, prev_rnd) for sf, tag in SFS}
    steady = load("sf01", 3)
    out = []
    out.append(f"### Sweep summary — round {rnd} "
               f"(derived by tools/mkheadlines.py from tools/bench_*_r{rnd}.json; "
               f"comparisons vs r{prev_rnd})")
    out.append("")
    out.append(f"| scale | total | entries | vs r{prev_rnd} shared queries |")
    out.append("|---|---|---|---|")
    for sf, _tag in SFS:
        c = cur[sf]
        if c is None:
            continue
        excl = f", {len(c.get('excluded', []))} excluded by policy" \
            if c.get("excluded") else ""
        cmp_txt = "—"
        s = shared_sum(c, prev[sf])
        if s:
            cs, ps, n = s
            cmp_txt = (f"shared-{n}: {fmt(cs)} vs {fmt(ps)} s "
                       f"({cs / ps:.2f}x)")
        out.append(f"| {sf} | {fmt(c['value'])} s | {c['ok']} ok, "
                   f"{c['failed']} failed{excl} | {cmp_txt} |")
    out.append("")
    if cur["sf0.1"] is not None and steady is not None:
        cs, ps, n = shared_sum(cur["sf0.1"], steady)
        out.append(f"- sf0.1 vs the r3 steady state, shared-{n}: "
                   f"**{fmt(cs)} vs {fmt(ps)} s = {cs / ps:.2f}x** "
                   f"(bar: 2x).")
    # exponents sf1 -> sf25 on queries present in both
    if cur["sf1"] is not None and cur["sf25"] is not None:
        q1, q25 = cur["sf1"]["queries"], cur["sf25"]["queries"]
        exps = {}
        for q in set(q1) & set(q25):
            if q1[q] > 0 and q25[q] > 0:
                exps[q] = math.log(q25[q] / q1[q]) / math.log(25.0)
        med = sorted(exps.values())[len(exps) // 2]
        over = sorted((q, e) for q, e in exps.items() if e > 1.0)
        out.append(f"- median exponent sf1→sf25 over {len(exps)} shared "
                   f"queries: **{med:.2f}**; entries with exp > 1.0: "
                   + (", ".join(f"{q} ({e:.2f})" for q, e in over)
                      if over else "none") + ".")
        top = sorted(q25.items(), key=lambda kv: -kv[1])[:5]
        out.append("- slowest sf25 entries: "
                   + ", ".join(f"{q} {fmt(t)} s" for q, t in top) + ".")
    if cur["sf25"] is not None and prev["sf25"] is not None:
        s = shared_sum(cur["sf25"], prev["sf25"])
        if s:
            cs, ps, n = s
            out.append(f"- sf25 shared-{n} vs r{prev_rnd}: "
                       f"**{fmt(cs)} vs {fmt(ps)} s "
                       f"({(cs / ps - 1) * 100:+.0f}%)**.")
    return "\n".join(out)


def query_table(rnd: int) -> str:
    cur = {sf: load(tag, rnd) for sf, tag in SFS}
    names = set()
    for sf, _ in SFS:
        if cur[sf]:
            names |= set(cur[sf]["queries"])
    out = [f"### Per-query bench, round {rnd} (seconds; derived by "
           f"tools/mkheadlines.py from tools/bench_*_r{rnd}.json)", ""]
    out.append("| query | sf0.1 | sf1 | sf5 | sf25 | exp sf1→sf25 |")
    out.append("|---|---|---|---|---|---|")
    for q in sorted(names):
        row = [q]
        for sf, _ in SFS:
            t = cur[sf]["queries"].get(q) if cur[sf] else None
            row.append(f"{t:.2f}" if t is not None else "—")
        t1 = cur["sf1"]["queries"].get(q) if cur["sf1"] else None
        t25 = cur["sf25"]["queries"].get(q) if cur["sf25"] else None
        if t1 and t25 and t1 > 0 and t25 > 0:
            row.append(f"{math.log(t25 / t1) / math.log(25.0):.2f}")
        else:
            row.append("—")
        out.append("| " + " | ".join(row) + " |")
    for sf, _ in SFS:
        if cur[sf] and cur[sf].get("excluded"):
            out.append("")
            out.append(f"Excluded at {sf} by the artifact's policy: "
                       + ", ".join(cur[sf]["excluded"]) + ".")
    return "\n".join(out)


def splice(text: str, begin: str, end: str, block: str) -> str:
    pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
    repl = begin + "\n" + block + "\n" + end
    if pat.search(text):
        return pat.sub(lambda _m: repl, text)
    raise SystemExit(f"marker pair {begin} .. {end} not found in SCALE.md")


def main() -> int:
    rnd = int(sys.argv[1])
    prev_rnd = rnd - 1
    if "--prev" in sys.argv:
        prev_rnd = int(sys.argv[sys.argv.index("--prev") + 1])
    h = headlines(rnd, prev_rnd)
    t = query_table(rnd)
    print(h)
    print()
    print(t[:2000] + ("\n... (table truncated on stdout)" if len(t) > 2000 else ""))
    if "--write" in sys.argv:
        with open(SCALE_MD) as f:
            text = f.read()
        text = splice(text, "<!-- mkheadlines:begin -->",
                      "<!-- mkheadlines:end -->", h)
        text = splice(text, "<!-- mkqueries:begin -->",
                      "<!-- mkqueries:end -->", t)
        with open(SCALE_MD, "w") as f:
            f.write(text)
        print("\nSCALE.md updated.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
