#!/bin/bash
# The sf1.0 scaling gate (SURVEY.md §7a.1): regenerate the 10× FK-preserving
# dataset, verify every registered key, DuckDB-parity the full board, and
# bench the frozen 30 headliners at 10× data. Run from the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 testdata/sf1.0 10"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $PWD/testdata/sf1.0 /tmp/verify_sf10"
python3 tools/parity.py "$PWD/testdata/sf1.0" /tmp/verify_sf10
SPARK_GRAFT_SF_DIR="$PWD/testdata/sf1.0" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench"
