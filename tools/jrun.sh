#!/bin/bash
# Run a graft main against the sbt-compiled classes with the SAME JVM
# options build.sbt gives forked runs (add-opens set, UTC session TZ,
# UI off, SPARK_DRIVER_MEM-sized heap). Exists so measurement sessions
# can sequence many mains without paying sbt's per-invocation startup;
# `sbt -batch "runMain ..."` remains the canonical entry (BASELINE.md).
set -euo pipefail
CLASSES=/root/repo/target/scala-2.13/classes
# Guard against silently benchmarking stale code: the script runs
# whatever sbt last compiled, so fail if any source or build-definition
# file is newer than the last `sbt compile` INVOCATION (the
# build.sbt-touched marker — it moves on no-op compiles too, unlike
# class/zinc mtimes, so deletes/renames and scalac-option changes are
# caught and a touched-but-unchanged file cannot trip the guard
# forever). Falls back to the newest-.class compare on a checkout that
# predates the marker.
[ -d "$CLASSES" ] || { echo "jrun: $CLASSES missing — run sbt compile" >&2; exit 1; }
# No depth limit on src/main: the bulk of the sources live at depth 4
# (src/main/scala/graft/functions/*.scala et al.), which a -maxdepth 3
# scan silently missed — edits there then benchmarked stale classes.
# Only the sbt metadata dir is depth-limited.
SRC_T=$({ find /root/repo/src/main /root/repo/build.sbt \
    -type f \( -name '*.scala' -o -name '*.sbt' -o -name '*.properties' \) \
    -printf '%T@\n';
  find /root/repo/project -maxdepth 2 \
    -type f \( -name '*.scala' -o -name '*.sbt' -o -name '*.properties' \) \
    -printf '%T@\n'; } | sort -rn | head -1)
MARKER=/root/repo/target/last-sbt-compile
if [ -f "$MARKER" ]; then
  CLS_T=$(stat -c '%.Y' "$MARKER")
else
  CLS_T=$(find "$CLASSES" -name '*.class' -printf '%T@\n' | sort -rn | head -1)
fi
if [ -z "$CLS_T" ] || awk -v s="$SRC_T" -v c="$CLS_T" 'BEGIN{exit !(s>c)}'; then
  echo "jrun: sources or build definition changed after the last sbt compile — run sbt compile" >&2
  exit 1
fi
CP="$CLASSES:$(ls /opt/spark/jars/*.jar | tr '\n' ':' | sed 's/:$//')"
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
