#!/bin/bash
# Round-11h — the sampled prefix-join on the SmallestKAgg cap (bounded
# partial state; the r11f window-cap leg measured the pre-cap candidate
# stream's exchange as the dense-x1000 ENOSPC at 541 s).
#  h1) dense decades 1,10,100 — beside r11d (window cap: 2.8/14.8/315.8 s).
#  h2) dense x1000 — the leg the window cap could not finish; own JVM,
#      3600 s budget.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r11h.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg h1 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_sampled \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11h1.json

run_leg h2 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_sampled \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=3600 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11h2.json

echo "PROBE BATTERY R11H DONE"
