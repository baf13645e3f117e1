#!/bin/bash
# Round-10 bench ladder. sf25 runs single-attempt with the 11-entry
# exclusion policy (the corpus-proportional contract gates whose
# fixed-work twins carry the design cost — r9 VERDICT #2 folded
# ext_sim_lsh_delta in).
set -e
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf01_r10.json && echo DONE01
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf1_r10.json && echo DONE1
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf5 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf5_r10.json && echo DONE5
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_EXCLUDE=ext_sim_ivf,ext_sim_ivf_indexed,ext_sim_ivfpq,ext_sim_ivfpq_adaptive,ext_sim_ivfpq_appended,ext_sim_ivfpq_delta,ext_sim_ivfpq_indexed,ext_sim_pq,ext_sim_topk,join_fuzzy_levenshtein,ext_sim_lsh_delta \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf25_r10.json && echo DONE25ALL
