#!/bin/bash
# Round-12 bench ladder. Same rungs/policies as r11, plus the
# box-epoch CONTROL (r11 VERDICT #6): before the sf0.1 and sf25 rungs,
# the PRIOR round's commit is rebuilt in a worktree and 8 sentinel
# entries rerun best-of-2; merge_control.py embeds them in the new
# artifacts so every cross-round ratio carries its own box-drift
# reading. sf100 keeps the ONLY scoping (fixture holds only the tables
# the list reads) — the list itself is now recorded in the artifact's
# "only" field (r11 ADVICE #3).
set -e
cd /root/repo
R11_COMMIT=72024e5

bash tools/box_control.sh $R11_COMMIT /root/testdata/sf0.1 \
  /tmp/control_sf01.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf01_r12.json
python3 tools/merge_control.py tools/bench_sf01_r12.json \
  /tmp/control_sf01.json tools/bench_sf01_r11.json $R11_COMMIT && echo DONE01

SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf1_r12.json && echo DONE1

SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf5 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf5_r12.json && echo DONE5

bash tools/box_control.sh $R11_COMMIT /tmp/sfdata/sf25 \
  /tmp/control_sf25.json
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_EXCLUDE=ext_sim_ivf,ext_sim_ivf_indexed,ext_sim_ivfpq,ext_sim_ivfpq_adaptive,ext_sim_ivfpq_appended,ext_sim_ivfpq_delta,ext_sim_ivfpq_indexed,ext_sim_pq,ext_sim_topk,join_fuzzy_levenshtein,ext_sim_lsh_delta,ext_sim_binary,ext_sim_binary_indexed,ext_sim_filtered,ext_sim_filtered_ivfpq \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf25_r12.json
python3 tools/merge_control.py tools/bench_sf25_r12.json \
  /tmp/control_sf25.json tools/bench_sf25_r11.json $R11_COMMIT && echo DONE25

SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_ONLY=bench_sim_topk_fq,bench_sim_lsh_fq,bench_sim_lsh_build_fq,bench_sim_ivf_build_fq,bench_sim_ivfpq_build_fq,bench_sim_lsh_indexed_fq,bench_sim_lsh_delta_fq,bench_sim_ivf_fq,bench_sim_ivf_indexed_fq,bench_sim_pq_fq,bench_sim_binary_fq,bench_sim_binary_indexed_fq,bench_sim_ivfpq_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivfpq_append_fq,bench_running_sum_fq,bench_dedup_semantic_fq,bench_dedup_semantic_count_fq,bench_dedup_semantic_rc_fq,ext_dedup_semantic,join_shuffle_agg,ext_sim_lsh,ext_sim_lsh_indexed,ext_dedup_embedding \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf100_r12.json && echo DONE100
