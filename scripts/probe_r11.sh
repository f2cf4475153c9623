#!/bin/bash
# Round-11 ScaleProbe battery — one sequential runner (legs must not
# overlap: each is a timed local[32] JVM; no other Spark work during it).
#  a) q_media_phash@cands64/@cands256 — banded CANDIDATE COUNTS at the two
#     code-length dials over the decorrelated blow-up (no true near-dups
#     added): the 64-bit dial's 2^16 band space saturates (count ~n^2/2^16)
#     while the 256-bit dial's 2^64 space keeps the count at the corpus's
#     own structure — the measured form of SCALE.md's code-length analysis.
#     x1000 runs under a wall budget: the 64-bit dial's ~381M-pair distinct
#     is EXPECTED to blow the budget/scratch (that's the finding).
#  b) q_prefix_filter_capped on the DENSE (clique) blow-up — the capped
#     emission mode completing on the corpus shape where the uncapped
#     form was measured output-bound (r10d: 24.7M true pairs at dense
#     x100). The dense dirs regenerate with the k%dim perturbation fix.
#  c) q_media_phash_neardup_256 full query, decorrelated 1,10,100 — the
#     production dial's wall curve beside the r7/r9 64-bit history.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r11.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg a env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands64,q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11a.json

# x1000 legs run in SEPARATE JVMs: the 64-bit dial's ~381M-pair distinct
# is expected to die (8g heap OOM'd at 432 s on the first attempt; with
# 96g it either completes or hits the scratch ceiling) and a fatal error
# stops the SparkContext, which must not take the 256-dial leg with it.
run_leg a2 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands256 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11a2.json

run_leg a3 env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash@cands64 \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11a3.json

run_leg b env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_capped \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11b.json

run_leg c env \
  SPARK_GRAFT_SCALE_QUERIES=q_media_phash_neardup_256 \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11c.json

echo "PROBE BATTERY R11 DONE"
