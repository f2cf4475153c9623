#!/bin/bash
# Round-9 ScaleProbe battery 2:
#  d) the r7 headline five (DefaultProbeQueries) at 1000x — extends the
#     SCALE.md headline table to a third measured decade
#  e) q_lsh_band_sweep@sampled — the production sampled-truth composition
#     (permille = 1000/factor keeps the measured slice fixture-sized), so
#     the expected curve is ~FLAT while the corpus grows 1000x underneath
set -e
cd /root/repo
export SPARK_DRIVER_MEM=96g

SPARK_GRAFT_SCALE_FACTORS=1,1000 \
SPARK_GRAFT_SCALE_PASSES=2 \
SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9d.json \
  sbt -batch 'runMain graft.ScaleProbe' 2>&1 | grep -E "\[scale\]" || true

SPARK_GRAFT_SCALE_QUERIES=q_lsh_band_sweep@sampled \
SPARK_GRAFT_SCALE_FACTORS=1,10,100,1000 \
SPARK_GRAFT_SCALE_PASSES=2 \
SPARK_GRAFT_SCALE_TIMEOUT_SEC=2400 \
SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r9e.json \
  sbt -batch 'runMain graft.ScaleProbe' 2>&1 | grep -E "\[scale\]" || true

echo "PROBE BATTERY 2 DONE"
