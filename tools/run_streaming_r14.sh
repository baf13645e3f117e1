#!/bin/bash
# Round-14 streaming evidence:
#  1. sustained + saturated five-pipeline regimes (the r12 protocol at
#     r14 code — the composed deduped_binary pipeline now runs the
#     BUCKETED _sbands layout, stateBuckets=32);
#  2. the dedicated >=10-batch composed window (r13 protocol);
#  3. ComposedProbe A/B: path layout (buckets=0, the r13 baseline
#     shape) vs bucketed (buckets=32) — the r13 weak mark's
#     done-condition is this slope comparison;
#  4. RebandProbe: per-trigger wall before/after rebandCorpus on a
#     corpus grown past its stream-start banding (r13 VERDICT #2).
# Assembles tools/bench_streaming_r14.json.
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

SPARK_GRAFT_CPUS=4 SPARK_GRAFT_STREAM_ONLY=deduped_binary sbt -batch \
  "runMain graft.tools.StreamingPerf 360 8000 15000 30000 20000 500" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_binlong500.json && echo LONG500

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.ComposedProbe 90000 10 5 0" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_stages_path.json && echo STAGES0

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.ComposedProbe 90000 10 5 32" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_stages_bucketed.json && echo STAGES32

SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.tools.RebandProbe 30000 12 5" \
  2>/dev/null | grep '^{"metric"' > /tmp/stream_reband.json && echo REBAND

python3 - <<'EOF'
import json
out = {
    "metric": "streaming_perf_rounds",
    "sustained": json.load(open("/tmp/stream_sustained.json")),
    "saturated": json.load(open("/tmp/stream_saturated.json")),
    "deduped_binary_long": json.load(open("/tmp/stream_binlong.json")),
    "deduped_binary_long_500": json.load(open("/tmp/stream_binlong500.json")),
    "composed_stages_path": json.load(open("/tmp/stream_stages_path.json")),
    "composed_stages_bucketed": json.load(open("/tmp/stream_stages_bucketed.json")),
    "reband": json.load(open("/tmp/stream_reband.json")),
}
json.dump(out, open("tools/bench_streaming_r14.json", "w"))
print("tools/bench_streaming_r14.json assembled")
EOF
