#!/bin/bash
# Round-13 streaming evidence (r12 VERDICT #2 + the r12 protocol):
#  1. sustained + saturated five-pipeline regimes (the r12 protocol,
#     re-run at r13 code);
#  2. a DEDICATED >=10-batch window for the composed deduped_binary
#     pipeline (r12 judged it on n=3 — anecdote) via
#     SPARK_GRAFT_STREAM_ONLY at a 360 s window / 30 s cadence;
#  3. per-stage attribution of the admission trigger
#     (tools.ComposedProbe: band-join vs in-batch pairing vs commits
#     vs index append, 10 instrumented batches).
# Assembles tools/bench_streaming_r13.json from the four parts.
set -e
cd /root/repo

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.StreamingPerf 120 8000 15000 30000 20000 3000" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_sustained.json && echo SUS

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.StreamingPerf 60 50000 60000 150000 80000 20000" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_saturated.json && echo SAT

SPARK_GRAFT_CPUS=4 SPARK_GRAFT_STREAM_ONLY=deduped_binary sbt -batch \
  "runMain graft.tools.StreamingPerf 360 8000 15000 30000 20000 3000" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_binlong.json && echo LONG

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.ComposedProbe 90000 10 5" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_stages.json && echo STAGES

python3 - <<'EOF'
import json
out = {
    "metric": "streaming_perf_rounds",
    "sustained": json.load(open("/tmp/stream_sustained.json")),
    "saturated": json.load(open("/tmp/stream_saturated.json")),
    "deduped_binary_long": json.load(open("/tmp/stream_binlong.json")),
    "composed_stages": json.load(open("/tmp/stream_stages.json")),
}
json.dump(out, open("tools/bench_streaming_r13.json", "w"))
print("tools/bench_streaming_r13.json assembled")
EOF
