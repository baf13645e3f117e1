#!/usr/bin/env python3
"""Derive the sf100 ladder-rung block for SCALE.md from the shipped
artifacts (tools/bench_sf{1,5,25,100}_r<N>.json) — the mkheadlines
no-hand-typed-numbers rule.

For every query in the sf100 artifact it reports the sf25→sf100 wall
and scaling exponent (time ~ sf^e over the 4× step) next to the same
query's sf1→sf25 exponent, and FLAGS any entry whose exponent grew by
more than 0.15 across the step — the "curve bends past sf25" signal
the rung exists to catch (r10 VERDICT #5).

Usage:
  python3 tools/mksf100.py <round> [--write]

With --write, replaces the region between the markers in SCALE.md:

    <!-- mksf100:begin -->
    ...
    <!-- mksf100:end -->
"""
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCALE_MD = os.path.join(HERE, "..", "SCALE.md")


def load(tag, rnd):
    p = os.path.join(HERE, f"bench_{tag}_r{rnd}.json")
    with open(p) as f:
        return json.load(f)["queries"]


def load_control(tag, rnd):
    p = os.path.join(HERE, f"bench_{tag}_r{rnd}.json")
    with open(p) as f:
        return json.load(f).get("control")


def exp(t_lo, t_hi, sf_lo, sf_hi):
    if t_lo <= 0 or t_hi <= 0:
        return None
    return math.log(t_hi / t_lo) / math.log(sf_hi / sf_lo)


def block(rnd):
    q1 = load("sf1", rnd)
    q25 = load("sf25", rnd)
    q100 = load("sf100", rnd)
    rows = []
    flagged = []
    for name in sorted(q100):
        e_new = exp(q25[name], q100[name], 25, 100) if name in q25 else None
        e_old = (exp(q1[name], q25[name], 1, 25)
                 if name in q1 and name in q25 else None)
        bent = (e_new is not None and e_old is not None
                and e_new - e_old > 0.15)
        if bent:
            flagged.append(name)
        rows.append((name, q1.get(name), q25.get(name), q100[name],
                     e_old, e_new, bent))
    out = [
        f"Fixtures: `tools/datagen_big.py 100` (chunked writes — "
        "lineitem 600M rows, orders 150M, embeddings 2M); run scoped "
        "with `SPARK_GRAFT_BENCH_ONLY` to the fixed-work twins plus "
        "the five most expensive sf25 steady-state entries "
        "(single-attempt, like sf25). `e(1→25)` and `e(25→100)` are "
        "scaling exponents (time ∝ sf^e); an entry is FLAGGED when the "
        "exponent grows by > 0.15 across the new rung — the "
        "curve-bends-past-sf25 signal this rung exists to catch.", "",
        "| query | sf1 s | sf25 s | sf100 s | e(1→25) | e(25→100) | bent? |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t1, t25, t100, e_old, e_new, bent in rows:
        f = lambda v: "—" if v is None else f"{v:.2f}"
        out.append(f"| {name} | {f(t1)} | {f(t25)} | {t100:.2f} "
                   f"| {f(e_old)} | {f(e_new)} "
                   f"| {'**FLAG**' if bent else ''} |")
    es = [r[5] for r in rows if r[5] is not None]
    out += ["",
        f"Entries: {len(rows)}; flagged: "
        f"{', '.join(flagged) if flagged else 'NONE'}. "
        f"Median e(25→100) = {sorted(es)[len(es)//2]:.2f} over "
        f"{len(es)} shared entries."]
    # In-artifact box control (r13 VERDICT #3: the sf100 rung shipped
    # without one). The sentinels run the PRIOR round's commit on this
    # box adjacent to the rung, so sentinel_now/prior_artifact is pure
    # box epoch for that entry — any flag whose cross-round ratio sits
    # inside its sentinel's ratio is epoch, not code.
    ctrl = load_control("sf100", rnd)
    if ctrl:
        rs = sorted(ctrl["sentinels"][k] / ctrl["prior"][k]
                    for k in ctrl["prior"] if ctrl["prior"][k] > 0)
        per = ", ".join(
            f"`{k}` {ctrl['sentinels'][k] / ctrl['prior'][k]:.2f}"
            for k in sorted(ctrl["prior"]) if ctrl["prior"][k] > 0)
        out += ["",
            f"In-artifact box control (attempt-matched, commit "
            f"`{ctrl['commit']}`): box_ratio_median = "
            f"**{ctrl['box_ratio_median']}** over {len(rs)} sentinels "
            f"(spread {rs[0]:.2f}–{rs[-1]:.2f}); per-sentinel "
            f"now/prior: {per}. Cross-round sf100 comparisons must be "
            "read through these ratios."]
    return "\n".join(out)


def main():
    rnd = int(sys.argv[1])
    text = block(rnd)
    if "--write" in sys.argv:
        with open(SCALE_MD) as f:
            doc = f.read()
        begin, end = "<!-- mksf100:begin -->", "<!-- mksf100:end -->"
        if begin not in doc:
            raise SystemExit("markers missing from SCALE.md")
        pre, rest = doc.split(begin)
        _, post = rest.split(end)
        with open(SCALE_MD, "w") as f:
            f.write(pre + begin + "\n" + text + "\n" + end + post)
        print("SCALE.md updated")
    else:
        print(text)


if __name__ == "__main__":
    main()
