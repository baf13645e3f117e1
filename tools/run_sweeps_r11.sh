#!/bin/bash
# Round-11 bench ladder. sf25 keeps the r10 exclusion policy (the
# corpus-proportional contract gates whose fixed-work twins carry the
# design cost). sf100 is the NEW rung (r10 VERDICT #5): fixtures from
# tools/datagen_big.py hold only the tables its entry list reads
# (lineitem/orders/customer/embeddings/documents), so the run is
# scoped with SPARK_GRAFT_BENCH_ONLY to the bench_*_fq fixed-work
# twins plus the five most expensive steady-state catalog entries of
# the sf25 sweep — single-attempt, like sf25.
set -e
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf01_r11.json && echo DONE01
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf1_r11.json && echo DONE1
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf5 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf5_r11.json && echo DONE5
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_EXCLUDE=ext_sim_ivf,ext_sim_ivf_indexed,ext_sim_ivfpq,ext_sim_ivfpq_adaptive,ext_sim_ivfpq_appended,ext_sim_ivfpq_delta,ext_sim_ivfpq_indexed,ext_sim_pq,ext_sim_topk,join_fuzzy_levenshtein,ext_sim_lsh_delta,ext_sim_binary,ext_sim_binary_indexed,ext_sim_filtered \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf25_r11.json && echo DONE25
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_ONLY=bench_sim_topk_fq,bench_sim_lsh_fq,bench_sim_lsh_build_fq,bench_sim_ivf_build_fq,bench_sim_ivfpq_build_fq,bench_sim_lsh_indexed_fq,bench_sim_lsh_delta_fq,bench_sim_ivf_fq,bench_sim_ivf_indexed_fq,bench_sim_pq_fq,bench_sim_binary_fq,bench_sim_binary_indexed_fq,bench_sim_ivfpq_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivfpq_append_fq,bench_running_sum_fq,bench_dedup_semantic_fq,bench_dedup_semantic_rc_fq,ext_dedup_semantic,join_shuffle_agg,ext_sim_lsh,ext_sim_lsh_indexed,ext_dedup_embedding \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf100_r11.json && echo DONE100
