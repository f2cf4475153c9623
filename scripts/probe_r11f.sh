#!/bin/bash
# Round-11f — the dense (clique) blow-up's third decade for the SAMPLED
# prefix-join emission mode: the only mode that completed dense x100
# (315.8 s; uncapped and post-verify-capped both scratch-bound there).
# Its verify intermediate is bounded per doc, so dense x1000 should be
# ~output-linear; the leg either completes (the production emission mode
# has a measured third decade on the adversarial corpus shape) or DNFs
# at a known wall. Budget 3600 s, own JVM.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
LOG=target/probe_r11f.log
: > "$LOG"

echo "=== LEG f start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
env \
  SPARK_GRAFT_SCALE_MODE=dense \
  SPARK_GRAFT_SCALE_QUERIES=q_prefix_filter_sampled \
  SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_PASSES=1 \
  SPARK_GRAFT_SCALE_TIMEOUT_SEC=3600 \
  SPARK_GRAFT_SCALE_OUT=bench_results/scaleprobe-r11f.json \
  sbt -batch 'runMain graft.ScaleProbe' >>"$LOG" 2>&1
echo "=== LEG f done  $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
echo "PROBE BATTERY R11F DONE"
