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

sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf1.0 10"
# 16g driver heap: 4 concurrent queries share one executor-memory pool
# and at 6M-row scale the default 8g can starve the heaviest one
# (Verify also retries failures serially, so the gate is double-covered)
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $PWD/testdata/sf1.0 /tmp/verify_sf10"
python3 tools/parity.py "$PWD/testdata/sf1.0" /tmp/verify_sf10
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1.0" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench"

if [ "$SF3" = 1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf3.0 30"
  # 24g: at 18M-row scale the default 8g heap GC-thrashes the two
  # output-bound headliners (observed: GCLocker retries + failed page
  # allocations), contaminating every timing in the pass
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
  SPARK_GRAFT_SF_DIR="$PWD/testdata/sf3.0" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench"
fi

if [ "$F32" = 1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf1.0f32 10 32"
  SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1.0f32" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench"
fi
