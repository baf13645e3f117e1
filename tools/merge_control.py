#!/usr/bin/env python3
"""Embed a box-epoch control into a bench artifact (r11 VERDICT #6).

Usage: merge_control.py <artifact> <control_json> <prior_artifact> <commit> [attempts]

Adds a "control" field to <artifact>:
  {"commit": ..., "sentinels": {name: wall_now_at_prior_commit},
   "prior": {name: wall_recorded_by_prior_round},
   "attempts": {name: attempts_used_for_this_sentinel},
   "box_ratio_median": median(now/prior)}
box_ratio_median ~1.0 means the box runs like it did last round, so a
cross-round artifact ratio is code; far from 1.0 means box drift and
the cross-round ratio must be read through it.

Called twice for one artifact (e.g. relational sentinels at the rung's
attempt policy + ANN sentinels at the re-pass policy — r12 VERDICT
"What's wrong" #2 asked for ANN-class sentinels, and attempt-matching
means two control runs), the sentinel maps MERGE and the median is
recomputed over the union.
"""
import json
import statistics
import sys

artifact, control, prior, commit = sys.argv[1:5]
attempts = int(sys.argv[5]) if len(sys.argv) > 5 else 2
a = json.load(open(artifact))
c = json.load(open(control))
p = json.load(open(prior))
sent = {k: round(v, 3) for k, v in c["queries"].items()}
att = {k: attempts for k in sent}
prev = a.get("control")
if prev and prev.get("commit") == commit:
    sent = {**prev.get("sentinels", {}), **sent}
    att = {**prev.get("attempts", {}), **att}
prior_q = {k: round(p["queries"][k], 3) for k in sent if k in p["queries"]}
ratios = [sent[k] / prior_q[k] for k in prior_q if prior_q[k] > 0]
a["control"] = {
    "commit": commit,
    "sentinels": sent,
    "prior": prior_q,
    "attempts": att,
    "box_ratio_median": round(statistics.median(ratios), 3) if ratios else None,
}
json.dump(a, open(artifact, "w"))
print(f"{artifact}: control embedded ({len(sent)} sentinels), "
      f"box_ratio_median={a['control']['box_ratio_median']}")
