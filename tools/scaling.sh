#!/bin/bash
# Scaling-efficiency evidence (BASELINE.md protocol): identical pipeline job
# at local[8] and local[32] on the same (replicated) input.
# eff = T8 / (4 * T32)  (ideal 4x speedup from 4x threads).
set -e
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-target/scaling}
REPL=${3:-4}
DAYS=${4:-28}
mkdir -p "$OUT"
export GRAFT_MEM=48g
export SPARK_GRAFT_BENCH_REPL=$REPL
export SPARK_GRAFT_BENCH_DAYS=$DAYS
export SPARK_GRAFT_STAGES_ONLY=1
export SPARK_GRAFT_SF_DIR=$SF
for P in 8 32; do
  echo "== local[$P] warm-up + 3 timed runs =="
  SPARK_GRAFT_CPUS=$P tools/run.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/warm_$P.json"
  for i in 1 2 3; do
    SPARK_GRAFT_CPUS=$P tools/run.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/run_${P}_$i.json"
  done
done
python3 tools/scaling_report.py "$OUT"
