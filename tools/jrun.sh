#!/bin/bash
# Run a graft main against the sbt-compiled classes with the SAME JVM
# options build.sbt gives forked runs (add-opens set, UTC session TZ,
# UI off, SPARK_DRIVER_MEM-sized heap). Exists so measurement sessions
# can sequence many mains without paying sbt's per-invocation startup;
# `sbt -batch "runMain ..."` remains the canonical entry (BASELINE.md).
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  "$@"
