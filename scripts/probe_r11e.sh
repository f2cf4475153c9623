#!/bin/bash
# Round-11e ScaleProbe battery — the pHash family RE-MEASURED on the
# scan-side band-code path (plans/PhashExpressions.scala), which replaced
# the posexplode→groupBy(doc,seg) pixel stage whose Θ(total chars)
# shuffle was the measured x1000 scratch bound (r11a2/a3: ENOSPC after
# 759–1008 s at either dial).
#  e1) full q_media_phash_neardup_256 + both candidate-count dials,
#      decorrelated 1,10,100 — the wall curve beside r11a/r11c (old path).
#  e2) @cands256 x1000 — the leg the old path could not finish: 2^64 band
#      space keeps candidates ≈ corpus structure, so with the pixel
#      shuffle gone this should be scan-bound and COMPLETE.
#  e3) full q_media_phash_neardup_256 x1000 — production dial, third
#      decade, end to end.
#  e4) @cands64 x1000 — the 64-bit dial's ~381M-pair distinct is the
#      DATA's quadratic (n²/2¹⁶ saturation); with the pixel stage fixed
#      the leg now measures where the candidate join itself lands.
# Legs e2-e4 run in SEPARATE JVMs so a fatal leg cannot take the rest
# down with it.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r11e.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg e1 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash_neardup_256,q_media_phash@cands64,q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11e1.json

run_leg e2 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11e2.json

run_leg e3 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash_neardup_256 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11e3.json

run_leg e4 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands64 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11e4.json

echo "PROBE BATTERY R11E DONE"
