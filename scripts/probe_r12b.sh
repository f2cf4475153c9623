#!/bin/bash
# Round-12b — dense x100 for the OTHER two prefix-filter dials, post
# hash-array verify. Pre-rewrite both ERR'd on the (pair x shingle)
# string verify exchange (uncapped 474 s scaleprobe-r10d, post-verify-
# capped 322 s r11b). The dense x100 true pair set is 24.7M pairs; at
# ~450 B/pair of attached hash arrays the verify exchange is ~11 GB —
# it should now fit, upgrading two DNF adjudications to measurements.
# (Dense x1000 for these dials stays data-impossible: 2.5G true pairs.)
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r12b.log
: > "$LOG"

echo "=== LEG b1 start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_join,q_prefix_filter_capped \
  SPARK_GRAFT_SCALE_FACTORS=1,100 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=1800 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r12b1.json \
  sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
echo "=== LEG b1 done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
echo "PROBE BATTERY R12B DONE"
