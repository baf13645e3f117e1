#!/bin/bash
# Resume of run_sweeps_r14.sh after the box killed the tmux server
# mid-sf5: sf0.1 (with control + solo merge) and sf1 completed; this
# picks up at the sf5 rung and continues through sf25 and sf100
# unchanged from the ladder script. Then runs the streaming ladder.
set -e
cd /root/repo
R13_COMMIT=a9d37ef

SENT_REL=q1_pricing_summary,proj_datetime_suite,etl_scd2,win_rank_suite,agg_having,join_semi_exists,sql_q5_local_supplier,join_shuffle_agg
SENT_ANN=bench_sim_ivfpq_indexed_fq,bench_sim_binary_fq,bench_sim_ivfpq_build_fq
ANN_REPASS=bench_sim_ivfpq_build_fq,bench_sim_ivf_build_fq,bench_sim_lsh_build_fq,bench_sim_ivfpq_append_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivf_fq,bench_sim_binary_fq,bench_sim_ivfpq_deleted_fq
SENT_SF100=join_shuffle_agg,bench_running_sum_fq,bench_sim_ivfpq_append_fq,bench_sim_binary_fq,bench_sim_lsh_indexed_fq,bench_sim_topk_fq
SF100_ONLY=bench_sim_topk_fq,bench_sim_lsh_fq,bench_sim_lsh_build_fq,bench_sim_ivf_build_fq,bench_sim_ivfpq_build_fq,bench_sim_lsh_indexed_fq,bench_sim_lsh_filtered_fq,bench_sim_lsh_delta_fq,bench_sim_ivf_fq,bench_sim_ivf_indexed_fq,bench_sim_pq_fq,bench_sim_binary_fq,bench_sim_binary_indexed_fq,bench_sim_ivfpq_fq,bench_sim_ivfpq_indexed_fq,bench_sim_ivfpq_append_fq,bench_running_sum_fq,bench_dedup_semantic_fq,bench_dedup_semantic_count_fq,bench_dedup_semantic_rc_fq,ext_dedup_semantic,join_shuffle_agg,ext_sim_lsh,ext_sim_lsh_indexed,ext_sim_filtered_lsh,ext_dedup_embedding

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

# ---- streaming ladder (sequential, after the batch rungs) -----------
bash tools/run_streaming_r14.sh && echo DONESTREAM
