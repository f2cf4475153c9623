#!/bin/bash
# Round-13 controlled bench artifact (the r7 verdict's discipline, kept
# every round since): the complete registry at sf0.1, min-of-4 in-JVM
# passes, written to bench_results/ so the official per-round BENCH line
# has a same-machine comparator inside the documented noise band. Run
# with NOTHING else on the box (no probe legs, no compiles).
set -eu
cd /root/repo
export SPARK_DRIVER_MEM=96g
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_PASSES=4 \
SPARK_GRAFT_BENCH_OUT=bench_results/sf0.1-r13-final.json \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -E '"metric"|\[bench\]' || true
echo "CONTROLLED BENCH DONE"
