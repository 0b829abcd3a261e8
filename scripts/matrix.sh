#!/bin/bash
# Round robustness matrix: cold-warehouse Verify + DuckDB check at
# cpus x sf combinations (the per-round discipline SURVEY.md §20 cites).
# Usage: bash scripts/matrix.sh  (run from /root/repo, box calm)
set -u
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
# Spark 4 on JDK 17 outside spark-submit needs the same module opens
# build.sbt gives forked runs (sun.util.calendar etc. — date decode on
# the driver fails without them)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for cell in "4 sf0.001" "7 sf0.001" "4 sf0.01" "8 sf0.01" "32 sf0.01"; do
  set -- $cell
  cpus=$1; sf=$2
  rm -rf spark-warehouse
  out=/tmp/matrix_${sf}_${cpus}
  rm -rf "$out"
  SPARK_GRAFT_CPUS=$cpus java $OPENS -Xmx8g -cp "$CP" graft.Verify \
    /root/testdata/$sf "$out" 2>/dev/null | grep -iE "verify.*failed"
  echo "=== $sf cpus=$cpus ==="
  python3 scripts/check.py /root/testdata/$sf "$out" 2>/dev/null | tail -1
done
