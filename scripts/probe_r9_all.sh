#!/bin/bash
# Round-9 ScaleProbe battery — one sequential runner (legs must not overlap:
# each is a timed local[32] JVM).
#  b) q_embed_dedup_groups       — registry path (fixture-pinned 64-bucket
#     LSH), probed TO its documented quadratic cliff under a 900 s wall
#  c) q_embed_dedup_groups@logbits — the production dial (bits ∝ log2 corpus),
#     1/10/100/1000x: the linear-scaling counterpart of (b)
#  d) the r7 headline five (DefaultProbeQueries) at 1/1000x — extends the
#     SCALE.md headline table to a third measured decade
#  e) q_lsh_band_sweep@sampled   — production sampled-truth composition
#     (permille = 1000/factor keeps the measured slice fixture-sized), so
#     the expected curve is ~FLAT while the corpus grows 1000x underneath
#  a2) q_lsh_band_sweep @1000x retry with FULL stderr — the r9a artifact
#      recorded a DNF at 391 s; this leg captures the actual failure mode
# Full (ungrepped) output tees to target/probe_r9_all.log.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r9_all.log
: > "$LOG"

run_leg() {
  local name="$1"; shift
  echo "=== LEG $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  "$@" sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
  echo "=== LEG $name done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
}

run_leg b env \
  SPARK_GRAFT_SCALE_QUERIES=q_embed_dedup_groups \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9b.json

run_leg c env \
  SPARK_GRAFT_SCALE_QUERIES=q_embed_dedup_groups@logbits \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100,1000 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9c.json

run_leg d env \
  SPARK_GRAFT_SCALE_FACTORS=1,1000 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9d.json

run_leg e env \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_band_sweep@sampled \
  SPARK_GRAFT_SCALE_FACTORS=1,10,100,1000 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9e.json

#  f) the two documented superlinear scalers from the r7 battery
#     (q_prefix_filter_join 5.6x per decade, q_media_phash_neardup ~2.2x
#     per half-decade) pushed into the third decade
run_leg f env \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_join,q_media_phash_neardup \
  SPARK_GRAFT_SCALE_FACTORS=1,1000 \
  SPARK_GRAFT_SCALE_PASSES=2 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9f.json

run_leg a2 env \
  SPARK_GRAFT_SCALE_QUERIES=q_lsh_band_sweep \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9a2.json

echo "PROBE BATTERY ALL DONE"
