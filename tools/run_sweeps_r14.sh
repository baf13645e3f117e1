#!/bin/bash
# Round-14 bench ladder. Changes vs r13 (each closing an r13 VERDICT
# item):
#  - the sf100 rung gains the attempt-matched IN-ARTIFACT control the
#    r13 artifact shipped without (VERDICT "What's missing" #3): the
#    control sentinel set includes the two flagged entries
#    (bench_running_sum_fq e=1.42, bench_sim_ivfpq_append_fq e=1.18)
#    so the control itself adjudicates epoch-asymmetry vs code.
#  - solo best-of-2 re-pass on ext_sim_pq and join_topk_q3 at sf0.1
#    (VERDICT "What's wrong" #3 — the loaded-box BENCH_r13 question).
set -e
cd /root/repo
R13_COMMIT=a9d37ef

SENT_REL=q1_pricing_summary,proj_datetime_suite,etl_scd2,win_rank_suite,agg_having,join_semi_exists,sql_q5_local_supplier,join_shuffle_agg
SENT_ANN=bench_sim_ivfpq_indexed_fq,bench_sim_binary_fq,bench_sim_ivfpq_build_fq
ANN_REPASS=bench_sim_ivfpq_build_fq,bench_sim_ivf_build_fq,bench_sim_lsh_build_fq,bench_sim_ivfpq_append_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivf_fq,bench_sim_binary_fq,bench_sim_ivfpq_deleted_fq
SENT_SF100=join_shuffle_agg,bench_running_sum_fq,bench_sim_ivfpq_append_fq,bench_sim_binary_fq,bench_sim_lsh_indexed_fq,bench_sim_topk_fq
SF100_ONLY=bench_sim_topk_fq,bench_sim_lsh_fq,bench_sim_lsh_build_fq,bench_sim_ivf_build_fq,bench_sim_ivfpq_build_fq,bench_sim_lsh_indexed_fq,bench_sim_lsh_filtered_fq,bench_sim_lsh_delta_fq,bench_sim_ivf_fq,bench_sim_ivf_indexed_fq,bench_sim_pq_fq,bench_sim_binary_fq,bench_sim_binary_indexed_fq,bench_sim_ivfpq_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivfpq_append_fq,bench_running_sum_fq,bench_dedup_semantic_fq,bench_dedup_semantic_count_fq,bench_dedup_semantic_rc_fq,ext_dedup_semantic,join_shuffle_agg,ext_sim_lsh,ext_sim_lsh_indexed,ext_sim_filtered_lsh,ext_dedup_embedding

# ---- sf0.1 (default attempts=2 → control at 2) ----------------------
bash tools/box_control.sh $R13_COMMIT /root/testdata/sf0.1 \
  /tmp/control_sf01.json "$SENT_REL,$SENT_ANN" 2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf01_r14.json
python3 tools/merge_control.py tools/bench_sf01_r14.json \
  /tmp/control_sf01.json tools/bench_sf01_r13.json $R13_COMMIT 2
# solo best-of-2 on the two loaded-box-flagged entries, merged in
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=2 \
  SPARK_GRAFT_BENCH_ONLY=ext_sim_pq,join_topk_q3 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > /tmp/bench_sf01_r14_solo.json
python3 tools/merge_rows.py tools/bench_sf01_r14.json \
  /tmp/bench_sf01_r14_solo.json 2 && echo DONE01

# ---- sf1 / sf5 ------------------------------------------------------
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf1_r14.json && echo DONE1

SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf5 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf5_r14.json && echo DONE5

# ---- sf25: attempts=1 bulk + attempts=2 ANN re-pass -----------------
bash tools/box_control.sh $R13_COMMIT /tmp/sfdata/sf25 \
  /tmp/control_sf25.json "$SENT_REL" 1
bash tools/box_control.sh $R13_COMMIT /tmp/sfdata/sf25 \
  /tmp/control_sf25_ann.json "$SENT_ANN" 1
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_EXCLUDE=ext_sim_ivf,ext_sim_ivf_indexed,ext_sim_ivfpq,ext_sim_ivfpq_adaptive,ext_sim_ivfpq_appended,ext_sim_ivfpq_delta,ext_sim_ivfpq_indexed,ext_sim_ivfpq_deleted,ext_sim_retained,ext_sim_pq,ext_sim_topk,join_fuzzy_levenshtein,ext_sim_lsh_delta,ext_sim_binary,ext_sim_binary_indexed,ext_sim_filtered,ext_sim_filtered_ivfpq \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf25_r14.json
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=2 \
  SPARK_GRAFT_BENCH_ONLY=$ANN_REPASS \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > /tmp/bench_sf25_r14_ann.json
python3 tools/merge_rows.py tools/bench_sf25_r14.json \
  /tmp/bench_sf25_r14_ann.json 2
python3 tools/merge_control.py tools/bench_sf25_r14.json \
  /tmp/control_sf25.json tools/bench_sf25_r13.json $R13_COMMIT 1
python3 tools/merge_control.py tools/bench_sf25_r14.json \
  /tmp/control_sf25_ann.json tools/bench_sf25_r13.json $R13_COMMIT 1 && echo DONE25

# ---- sf100: subset fixture WITH the attempt-matched control ---------
bash tools/box_control.sh $R13_COMMIT /tmp/sfdata/sf100 \
  /tmp/control_sf100.json "$SENT_SF100" 1
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_ONLY=$SF100_ONLY \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf100_r14.json
python3 tools/merge_control.py tools/bench_sf100_r14.json \
  /tmp/control_sf100.json tools/bench_sf100_r13.json $R13_COMMIT 1 && echo DONE100
