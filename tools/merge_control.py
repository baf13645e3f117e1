#!/usr/bin/env python3
"""Embed a box-epoch control into a bench artifact (r11 VERDICT #6).

Usage: merge_control.py <artifact> <control_json> <prior_artifact> <commit>

Adds a "control" field to <artifact>:
  {"commit": ..., "sentinels": {name: wall_now_at_prior_commit},
   "prior": {name: wall_recorded_by_prior_round},
   "box_ratio_median": median(now/prior)}
box_ratio_median ~1.0 means the box runs like it did last round, so a
cross-round artifact ratio is code; far from 1.0 means box drift and
the cross-round ratio must be read through it.
"""
import json
import statistics
import sys

artifact, control, prior, commit = sys.argv[1:5]
a = json.load(open(artifact))
c = json.load(open(control))
p = json.load(open(prior))
sent = c["queries"]
prior_q = {k: p["queries"][k] for k in sent if k in p["queries"]}
ratios = [sent[k] / prior_q[k] for k in prior_q if prior_q[k] > 0]
a["control"] = {
    "commit": commit,
    "sentinels": {k: round(v, 3) for k, v in sent.items()},
    "prior": {k: round(v, 3) for k, v in prior_q.items()},
    "box_ratio_median": round(statistics.median(ratios), 3) if ratios else None,
}
json.dump(a, open(artifact, "w"))
print(f"{artifact}: control embedded, box_ratio_median="
      f"{a['control']['box_ratio_median']}")
