#!/bin/bash
# Round-13 bench ladder. Changes vs r12 (each closing an r12 VERDICT
# "What's wrong" item):
#  - the box control is ATTEMPT-MATCHED to the recording it arbitrates
#    (#1): box_control.sh takes the attempt policy; the sf25 control
#    runs at the rung's attempts=1 against r12's attempts=1 recording.
#  - the control set gains ANN-class sentinels (#2):
#    bench_sim_ivfpq_indexed_fq + bench_sim_binary_fq (+ the flagged
#    bench_sim_ivfpq_build_fq at sf25), merged into the same control
#    field via two merge_control.py calls.
#  - the high-variance ANN entries re-record BEST-OF-2 at sf25 (#1):
#    a second pass at attempts=2 overwrites their rows
#    (merge_rows.py), per-entry attempts recorded in the artifact.
set -e
cd /root/repo
R12_COMMIT=b6ea23b

SENT_REL=q1_pricing_summary,proj_datetime_suite,etl_scd2,win_rank_suite,agg_having,join_semi_exists,sql_q5_local_supplier,join_shuffle_agg
SENT_ANN=bench_sim_ivfpq_indexed_fq,bench_sim_binary_fq,bench_sim_ivfpq_build_fq
ANN_REPASS=bench_sim_ivfpq_build_fq,bench_sim_ivf_build_fq,bench_sim_lsh_build_fq,bench_sim_ivfpq_append_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivf_fq,bench_sim_binary_fq,bench_sim_ivfpq_deleted_fq

# ---- sf0.1 (r12 recorded at the default attempts=2 → control at 2) --
bash tools/box_control.sh $R12_COMMIT /root/testdata/sf0.1 \
  /tmp/control_sf01.json "$SENT_REL,$SENT_ANN" 2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf01_r13.json
python3 tools/merge_control.py tools/bench_sf01_r13.json \
  /tmp/control_sf01.json tools/bench_sf01_r12.json $R12_COMMIT 2 && echo DONE01

# ---- sf1 / sf5 ------------------------------------------------------
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf1_r13.json && echo DONE1

SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf5 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf5_r13.json && echo DONE5

# ---- sf25: attempts=1 bulk + attempts=2 ANN re-pass -----------------
# (exclusions = r12's quadratic %50-slice catalog entries
#  + ext_sim_ivfpq_deleted, same reason as its _indexed sibling)
bash tools/box_control.sh $R12_COMMIT /tmp/sfdata/sf25 \
  /tmp/control_sf25.json "$SENT_REL" 1
bash tools/box_control.sh $R12_COMMIT /tmp/sfdata/sf25 \
  /tmp/control_sf25_ann.json "$SENT_ANN" 1
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_EXCLUDE=ext_sim_ivf,ext_sim_ivf_indexed,ext_sim_ivfpq,ext_sim_ivfpq_adaptive,ext_sim_ivfpq_appended,ext_sim_ivfpq_delta,ext_sim_ivfpq_indexed,ext_sim_ivfpq_deleted,ext_sim_pq,ext_sim_topk,join_fuzzy_levenshtein,ext_sim_lsh_delta,ext_sim_binary,ext_sim_binary_indexed,ext_sim_filtered,ext_sim_filtered_ivfpq \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf25_r13.json
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf25 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=2 \
  SPARK_GRAFT_BENCH_ONLY=$ANN_REPASS \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > /tmp/bench_sf25_r13_ann.json
python3 tools/merge_rows.py tools/bench_sf25_r13.json \
  /tmp/bench_sf25_r13_ann.json 2
python3 tools/merge_control.py tools/bench_sf25_r13.json \
  /tmp/control_sf25.json tools/bench_sf25_r12.json $R12_COMMIT 1
python3 tools/merge_control.py tools/bench_sf25_r13.json \
  /tmp/control_sf25_ann.json tools/bench_sf25_r12.json $R12_COMMIT 1 && echo DONE25

# ---- sf100 (subset fixture; ONLY list = r12 + the new operators) ----
SPARK_GRAFT_SF_DIR=/tmp/sfdata/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ATTEMPTS=1 \
  SPARK_GRAFT_BENCH_ONLY=bench_sim_topk_fq,bench_sim_lsh_fq,bench_sim_lsh_build_fq,bench_sim_ivf_build_fq,bench_sim_ivfpq_build_fq,bench_sim_lsh_indexed_fq,bench_sim_lsh_filtered_fq,bench_sim_lsh_delta_fq,bench_sim_ivf_fq,bench_sim_ivf_indexed_fq,bench_sim_pq_fq,bench_sim_binary_fq,bench_sim_binary_indexed_fq,bench_sim_ivfpq_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivfpq_append_fq,bench_running_sum_fq,bench_dedup_semantic_fq,bench_dedup_semantic_count_fq,bench_dedup_semantic_rc_fq,ext_dedup_semantic,join_shuffle_agg,ext_sim_lsh,ext_sim_lsh_indexed,ext_sim_filtered_lsh,ext_dedup_embedding \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '^{"metric"' > tools/bench_sf100_r13.json && echo DONE100
