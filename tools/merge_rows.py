#!/usr/bin/env python3
"""Overwrite entries of a bench artifact with rows from a RE-PASS
artifact run under a different attempt policy (r12 VERDICT "What's
wrong" #1: the sf25 rung's single-attempt walls were 1.4x stale-high
for the high-variance ANN entries — those entries re-run best-of-2
and their rows replace the single-attempt ones). Records the per-entry
attempt count in "attempts_per_entry" so the artifact is
self-describing, and recomputes "value" (= sum of per-query walls,
graft.Bench's own definition).

Usage: merge_rows.py <artifact> <repass_json> <repass_attempts>
"""
import json
import sys

artifact, repass, attempts = sys.argv[1], sys.argv[2], int(sys.argv[3])
a = json.load(open(artifact))
b = json.load(open(repass))
att = a.get("attempts_per_entry", {})
for k, v in b["queries"].items():
    a["queries"][k] = v
    att[k] = attempts
a["attempts_per_entry"] = att
# a re-recorded entry is no longer a missing row: demote its main-pass
# error (if any) to "flaky" so ok/failed reflect the final artifact
for k in b["queries"]:
    err = a.get("errors", {}).pop(k, None)
    if err:
        a.setdefault("flaky", {})[k] = err
a["failed"] = len(a.get("errors", {}))
a["ok"] = len(a["queries"])
a["value"] = round(sum(a["queries"].values()), 3)
json.dump(a, open(artifact, "w"))
print(f"{artifact}: {len(b['queries'])} rows re-recorded at "
      f"attempts={attempts}, value={a['value']}")
