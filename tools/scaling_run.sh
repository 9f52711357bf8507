#!/bin/bash
# Direct-JVM ScalingBench launcher (fresh JVM per level, no sbt overhead).
# Usage: tools/scaling_run.sh <cores> [events]
set -e
cd /root/repo
CORES=${1:-8}
EVENTS=${2:-24000000}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM=${SPARK_DRIVER_MEM:-8g}
exec java $ADD_OPENS -Xmx$MEM -Xms$MEM -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScalingBench "$CORES" "$EVENTS"
