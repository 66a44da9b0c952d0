#!/bin/bash
# Launch a graft harness main with the same JVM shape `sbt run` forks
# (build.sbt's jdk17AddOpens + spark defaults), without holding the sbt
# build lock — lets a long ScaleSweep overlap with `sbt test`.
# Usage: tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS (harness-read).
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
