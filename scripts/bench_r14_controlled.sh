#!/bin/bash
# Round-14 controlled bench artifact (the r7 verdict's discipline):
# the complete registry at sf0.1, min-of-4 in-JVM passes, written to
# bench_results/ so the official per-round BENCH line has a same-machine
# comparator inside the documented noise band. This is the FIRST
# full-registry controlled artifact of the sweep's final emission form
# (r13 residual #3: the three r13 artifacts measured superseded
# variants; the r14 build also hash-keys the sweep's banded join).
# Artifacts now carry canary_first / canary_mid_cpu / canary_last — the
# ambient factor is read from those, not argued from 266 ratios.
# Run with NOTHING else on the box (no probe legs, no compiles).
# Usage: bench_r14_controlled.sh [suffix]   (default: final)
set -eu
cd /root/repo
SUFFIX="${1:-final}"
export SPARK_DRIVER_MEM=96g
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_PASSES=4 \
SPARK_GRAFT_BENCH_OUT="bench_results/sf0.1-r14-${SUFFIX}.json" \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -E '"metric"|\[bench\]' || true
echo "CONTROLLED BENCH DONE (${SUFFIX})"
