#!/bin/bash
# Round-9 ScaleProbe battery (third decade + the pinned-vs-dialed LSH pair):
#  a) q_lsh_band_sweep — registry path, 1/10/100/1000x (third decade)
#  b) q_embed_dedup_groups — registry path (fixture-pinned 64-bucket LSH),
#     probed TO its documented quadratic cliff with a wall budget
#  c) q_embed_dedup_groups@logbits — the production dial (bits grows with
#     the corpus), 1/10/100/1000x — the linear-scaling counterpart of (b)
set -e
cd /root/repo
export SPARK_DRIVER_MEM=96g

SPARK_GRAFT_SCALE_QUERIES=q_lsh_band_sweep \
SPARK_GRAFT_SCALE_FACTORS=1,10,100,1000 \
SPARK_GRAFT_SCALE_PASSES=2 \
SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9.json \
  sbt -batch 'runMain graft.ScaleProbe' 2>&1 | grep -E "\[scale\]" || true

SPARK_GRAFT_SCALE_QUERIES=q_embed_dedup_groups \
SPARK_GRAFT_SCALE_FACTORS=1,10,100 \
SPARK_GRAFT_SCALE_PASSES=2 \
SPARK_GRAFT_SCALE_TIMEOUT_SEC=900 \
SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9b.json \
  sbt -batch 'runMain graft.ScaleProbe' 2>&1 | grep -E "\[scale\]" || true

SPARK_GRAFT_SCALE_QUERIES=q_embed_dedup_groups@logbits \
SPARK_GRAFT_SCALE_FACTORS=1,10,100,1000 \
SPARK_GRAFT_SCALE_PASSES=2 \
SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9c.json \
  sbt -batch 'runMain graft.ScaleProbe' 2>&1 | grep -E "\[scale\]" || true

echo "PROBE BATTERY DONE"
