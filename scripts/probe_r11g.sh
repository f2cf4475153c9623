#!/bin/bash
# Round-11g — the pHash family on the FIRST-MATCHING-BAND emission
# (distinct-free candidate stream; the r11e battery measured the
# distinct's exchange as the x1000 scratch bound: ENOSPC at 536 s).
#  g1) decades 1,10,100 for the full 256-bit query + both candidate
#      dials — beside r11e1 (scan-side codes, distinct emission) and
#      r11a/c (exploded pixel stage).
#  g2) @cands256 x1000 — 2^64 band space: candidates ≈ corpus structure.
#  g3) full q_media_phash_neardup_256 x1000 — production dial, third
#      decade, end to end.
#  g4) @cands64 x1000 — the 2^16-saturated dial: the candidate COUNT is
#      data-quadratic (~n^2/2^16) but with no distinct the stream is
#      never exchanged, so the leg measures whether the saturation cost
#      is now CPU-bound streaming instead of scratch-bound shuffle.
# x1000 legs in separate JVMs so a fatal leg cannot take the rest down.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r11g.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg g1 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash_neardup_256,q_media_phash@cands64,q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11g1.json

run_leg g2 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11g2.json

run_leg g3 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash_neardup_256 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11g3.json

run_leg g4 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands64 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11g4.json

echo "PROBE BATTERY R11G DONE"
