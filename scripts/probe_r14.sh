#!/bin/bash
# Round-14 — re-measure the band-sweep candidate stage's dense decades
# on the r14 emission form (join key = xxhash64(band key), the change
# that closed the earlier-band-collision LOSS class; Dedup.scala
# lshSweepCandidates). Comparators: scaleprobe-r13a4/a5 (array_position
# form, string join keys: x1 4.80 s, x10 9.02 s, x100 160.4 s) and
# scaleprobe-r13a2 (the forbidden distinct form: x100 558.7 s).
#  b1) emission form (hash-keyed), dense 1,10 min-of-2.
#  b2) emission form (hash-keyed), dense x100 single pass.
# Plus the round's headline find: the walker's string-taint extension
# caught the prefix-filter family still deduping its candidate join
# with distinct() (q_prefix_filter_join/_capped) — rewritten to the
# first-common-hash emission (Dedup.prefixCandidates). A/B on the
# dense decades:
#  b3) prefix emission form, dense 1,10 min-of-2.
#  b4) prefix distinct form (PROBE-ONLY pre-r14 shape), dense 1,10.
#  b5) prefix emission form, dense x100 single pass.
#  b6) prefix distinct form, dense x100 single pass.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r14.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg b1 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=1,10 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b1.json

run_leg b2 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=100 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b2.json

run_leg b3 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=1,10 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b3.json

run_leg b4 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter@cands_distinct \
  SPARK_GRAFT_SCALE_FACTORS=1,10 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b4.json

run_leg b5 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=100 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b5.json

run_leg b6 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter@cands_distinct \
  SPARK_GRAFT_SCALE_FACTORS=100 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r14b6.json

echo "PROBE r14 DONE"
