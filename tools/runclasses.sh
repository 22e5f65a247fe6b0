#!/bin/bash
# Run a graft main class from an arbitrary compiled-classes snapshot with the
# same JVM options sbt's forked `run` uses (build.sbt) — lets the optimization
# rounds A/B baseline vs changed classes without racing sbt recompiles against
# a forked bench JVM reading target/classes.
#   tools/runclasses.sh <classesDir> <mainClass> [args...]
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM as usual.
set -euo pipefail
CLASSES="$1"; MAIN="$2"; shift 2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
