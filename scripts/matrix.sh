#!/bin/bash
# Round robustness matrix: cold-warehouse Verify + DuckDB check at
# cpus x sf combinations (the per-round discipline SURVEY.md §20 cites).
# Usage: bash scripts/matrix.sh  (run from /root/repo, box calm)
set -u
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
for cell in "4 sf0.001" "7 sf0.001" "4 sf0.01" "8 sf0.01" "32 sf0.01"; do
  set -- $cell
  cpus=$1; sf=$2
  rm -rf spark-warehouse
  out=/tmp/matrix_${sf}_${cpus}
  rm -rf "$out"
  SPARK_GRAFT_CPUS=$cpus java -cp "$CP" graft.Verify /root/testdata/$sf "$out" \
    2>/dev/null | grep -iE "verify.*failed"
  echo "=== $sf cpus=$cpus ==="
  python3 scripts/check.py /root/testdata/$sf "$out" 2>/dev/null | tail -1
done
