#!/usr/bin/env bash
# Bare-JVM bench/profile runner mirroring build.sbt's forked JVM options
# (same GC, heap, module opens, tmpfs scratch) so boards measured here are
# comparable with sbt-forked ones and with the driver's own `java -cp`
# invocation. Usage:
#   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 tools/run_bench.sh [main] [args...]
# main defaults to graft.Bench (graft.Profile for explains/isolated reps).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:-graft.Bench}"; shift || true
JAR=target/scala-2.13/etlenergytrackerspark_2.13-0.1.0.jar
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCRATCH=/dev/shm/graft-tmp
mkdir -p "$SCRATCH"
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -XX:+UseParallelGC "-Xmx${SPARK_DRIVER_MEM:-24g}" \
  -Djava.io.tmpdir="$SCRATCH" -Dspark.local.dir="$SCRATCH" \
  -cp "$JAR:/opt/spark/jars/*" "$MAIN" "$@"
