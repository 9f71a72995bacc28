#!/bin/bash
# One controlled bench-plateau session (VERDICT r12 #3): 5 consecutive
# Bench passes at sf0.1 on THIS commit and host, then the per-query
# min/median/MAD table vs a reference BENCH record. Verdict rule:
#  - min-of-5 lands at the baseline level (±~5%) with small MADs →
#    the round-over-round 28-30 s readings are host contention on the
#    driver's bench box; re-certify the baseline at the measured level;
#  - min-of-5 reproduces the elevated level → real creep; the per-query
#    min/ref column names which queries carry it.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${PLATEAU_OUT:-/tmp/plateau}
REF=${PLATEAU_REF:-BENCH_r12.json}
mkdir -p "$OUT"
for i in 1 2 3 4 5; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" | tee "$OUT/pass$i.log"
done
python3 tools/plateau.py "$OUT"/pass{1,2,3,4,5}.log --ref "$REF" \
  | tee "$OUT/plateau.txt"
echo "[plateau] table written to $OUT/plateau.txt"
