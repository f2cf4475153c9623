#!/bin/bash
# Round-12a — the hash-array verify (SortedLongIntersectCount) on the
# prefix-filter family. r11 closed with both x1000 legs scratch-bound at
# the (pair x common-shingle) string verify exchange:
#   q_prefix_filter_sampled dense x1000 ERR 1047 s (scaleprobe-r11h2)
#   q_prefix_filter_join    x1000 adjudicated ~2x over the ~73 GB scratch
# The rewrite carries one sorted xxhash64 array per doc instead, so the
# pair-sized exchange shrinks ~7x at the fixture's ~52 shingles/doc.
#  a1) sampled dense decades 1,10,100 — beside r11h1 (3.3/9.2/191.5 s).
#  a2) sampled dense x1000 — the leg that has never completed; own JVM.
#  a3) uncapped join normal decades 1,10,100 — curve context post-rewrite.
#  a4) uncapped join normal x1000 — the r11 "needs ~2x scratch" leg.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r12.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg a1 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_sampled \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r12a1.json

run_leg a2 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_sampled \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=3600 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r12a2.json

run_leg a3 env \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_join \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r12a3.json

run_leg a4 env \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_join \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=3600 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r12a4.json

echo "PROBE BATTERY R12A DONE"
