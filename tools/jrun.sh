#!/bin/bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (for probe iteration while the sbt shell is busy).
# Usage: tools/jrun.sh <mainClass> [args...]   (env: SPARK_GRAFT_*, PROBE_*)
MAIN="$1"; shift
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
ARGS=""
for p in $OPENS; do ARGS="$ARGS --add-opens $p=ALL-UNNAMED"; done
exec java $ARGS -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
