#!/bin/bash
# Dual-scale correctness sweep: the driver's gate runs sf0.01 only, and
# that has twice missed cross-engine ROUNDING BOUNDARY splits that only
# materialize on other data (r14: quality_seasonal_anomaly's mu and
# embedding_cohesion_hist's avg_cos flipped a 4th decimal at sf0.001 —
# Spark rounds the binary double's exact decimal expansion, DuckDB
# computes round(x*10^k)/10^k in doubles, and near a boundary they
# disagree on IDENTICAL inputs). Run this once per round before closing.
#
# Usage: scripts/sweep_both_scales.sh [key ...]
#   no args -> full sweep at sf0.01 AND sf0.001 (each ~5-6 min)
#   keys    -> subset sweep at both scales
#
# Requires the compiled classes (sbt compile) and Spark jars at
# /opt/spark/jars. Exits nonzero if either scale reports a failure.
set -u
cd "$(dirname "$0")/.."
KEYS=("$@")
FAIL=0
for SF in sf0.01 sf0.001; do
  OUT=/tmp/verify_sweep_${SF}_$$
  echo "== Verify @ $SF -> $OUT"
  java \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -Xmx100g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "/root/testdata/$SF" "$OUT" "${KEYS[@]+"${KEYS[@]}"}" \
    2> "$OUT.err" || { echo "Verify crashed at $SF (see $OUT.err)"; FAIL=1; }
  python3 scripts/check_oracle.py "/root/testdata/$SF" "$OUT" \
    "${KEYS[@]+"${KEYS[@]}"}" 2>&1 | tail -3
  python3 scripts/check_oracle.py "/root/testdata/$SF" "$OUT" \
    "${KEYS[@]+"${KEYS[@]}"}" 2>/dev/null | grep -q " 0 failed" || FAIL=1
done
exit $FAIL
