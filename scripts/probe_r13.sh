#!/bin/bash
# Round-13 — the band-sweep candidate stage, both dedup shapes, on the
# DENSE blow-ups (the corpus class the streamed-not-exchanged rule exists
# for). r13 removed the sweep's distinct-over-banded-join after the
# registry walker flagged it; this battery measures what that bought:
#  a1) emission form, dense 1,10,100 — candidates streamed, 4 counts out.
#  a2) distinct form (probe-only reconstruction of the pre-r13 shape),
#      dense 1,10,100 — pair-sized partial state + exchange per cfg.
#  a3) emission form, dense x1000 — 5M docs in 1000-cliques, single pass.
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

run_leg a3 env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_sweep@cands_emit \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=3600 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r13a3.json

echo "PROBE r13 DONE"
