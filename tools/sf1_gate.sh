#!/bin/bash
# The STANDING round-close scaling gate (SURVEY.md §7a.1): regenerate the
# 10× FK-preserving dataset, verify every registered key, DuckDB-parity the
# full board, and bench the frozen 30 headliners at 10× data. Run from the
# repo root; budget ~65 min for the sf1.0 half.
#
# Optional extra measurement points (bench-only, no verify/parity):
#   --sf3      K=30 dataset → the third point of the §7a.1 exponent curve
#              (budget ~90 min: the two output-bound headliners dominate)
#   --files32  sf1.0 in a 32-part-file layout → scan-parallelism sidebar
#              (real-cluster layout: split width from files, not fanOut)
#
# Bench legs log to $GATE_OUT (default /tmp/sf1_gate); when the sf3 leg
# ran, the gate finishes by regenerating the §7a.1 exponent table with
# tools/exponents.py so the SURVEY numbers can't drift from the run.
set -euo pipefail
cd "$(dirname "$0")/.."

SF3=0; F32=0
for a in "$@"; do
  case "$a" in
    --sf3) SF3=1 ;;
    --files32) F32=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

GATE_OUT=${GATE_OUT:-/tmp/sf1_gate}
mkdir -p "$GATE_OUT"
# ONE pinned heap for every bench leg: the exponent curve compares
# timings across SFs, so differing GC pressure between legs (8g at
# sf1.0 vs 24g at sf3.0) would bias e(1→3). 24g is what the sf3 leg
# needs (GCLocker thrash below that); the sf1.0/f32 legs just get
# headroom they don't consume.
BENCH_MEM=${SPARK_DRIVER_MEM:-24g}

sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf1.0 10"
# 16g driver heap: 4 concurrent queries share one executor-memory pool
# and at 6M-row scale the default 8g can starve the heaviest one
# (Verify also retries failures serially, so the gate is double-covered)
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $PWD/testdata/sf1.0 /tmp/verify_sf10"
python3 tools/parity.py "$PWD/testdata/sf1.0" /tmp/verify_sf10
SPARK_DRIVER_MEM="$BENCH_MEM" \
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1.0" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" | tee "$GATE_OUT/bench_sf1.0.log"

if [ "$SF3" = 1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf3.0 30"
  SPARK_DRIVER_MEM="$BENCH_MEM" \
  SPARK_GRAFT_SF_DIR="$PWD/testdata/sf3.0" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" | tee "$GATE_OUT/bench_sf3.0.log"
fi

if [ "$F32" = 1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf1.0f32 10 32"
  SPARK_DRIVER_MEM="$BENCH_MEM" \
  SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1.0f32" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" | tee "$GATE_OUT/bench_sf1.0f32.log"
fi

# §7a.1 refresh: the curve's sf0.1 first point is re-benched HERE under
# the same pinned heap (a driver BENCH_r*.json ran at the default heap,
# so reusing it would bias e(0.1→1) exactly the way differing heaps
# biased e(1→3) before the BENCH_MEM pin).
if [ "$SF3" = 1 ]; then
  SPARK_DRIVER_MEM="$BENCH_MEM" \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" | tee "$GATE_OUT/bench_sf0.1.log"
  F32_ARG=""
  [ "$F32" = 1 ] && F32_ARG="$GATE_OUT/bench_sf1.0f32.log"
  python3 tools/exponents.py "$GATE_OUT/bench_sf0.1.log" \
    "$GATE_OUT/bench_sf1.0.log" \
    "$GATE_OUT/bench_sf3.0.log" $F32_ARG | tee "$GATE_OUT/exponents.txt"
  echo "[gate] §7a.1 table written to $GATE_OUT/exponents.txt"
fi
