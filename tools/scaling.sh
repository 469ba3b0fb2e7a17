#!/bin/bash
# Scaling-efficiency evidence (BASELINE.md protocol): identical Bench job at
# local[8] and local[32] on the same SF; efficiency = T32 / (4 * T8) wait —
# throughput-based: eff = (T8 * 8-thread time) vs ... see python below.
set -e
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-target/scaling}
mkdir -p "$OUT"
rm -rf target/bench  # cold pages materialization once per level? keep shared
for P in 8 32; do
  echo "== local[$P] warm-up + 3 timed runs =="
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$P tools/run.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/warm_$P.json"
  for i in 1 2 3; do
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$P tools/run.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/run_${P}_$i.json"
  done
done
python3 tools/scaling_report.py "$OUT"
