#!/bin/bash
# Round-13 — the band-sweep candidate stage, both dedup shapes, on the
# DENSE blow-ups (the corpus class the streamed-not-exchanged rule exists
# for). r13 removed the sweep's distinct-over-banded-join after the
# registry walker flagged it; this battery measures what that bought:
#  a1) emission form (string-lambda variant, as of commit 88218e5),
#      dense 1,10,100 — candidates streamed, 4 counts out.
#  a2) distinct form (probe-only reconstruction of the pre-r13 shape),
#      dense 1,10,100 — pair-sized partial state + exchange per cfg.
#  a4) emission form, FINAL array_position variant, dense 1,10 min-of-2.
#  a5) emission form, FINAL array_position variant, dense x100 single
#      pass — the 160.4 s headline vs a2's 558.7 s distinct.
# (A planned x1000 emission leg — the old a3 — was dropped: the r12
# adjudication stands that the uncapped dense x1000 candidate relation
# is the data's own quadratic and the @sampled adapter is the answer;
# no scaleprobe-r13a3.json exists.)
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r13.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg a1 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r13a1.json

run_leg a2 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_distinct \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r13a2.json

run_leg a4 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=1,10 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r13a4.json

run_leg a5 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=100 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r13a5.json

echo "PROBE r13 DONE"
