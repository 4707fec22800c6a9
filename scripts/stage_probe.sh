#!/bin/bash
# Pinned fresh-JVM index-build probe with per-stage metrics.
# Usage: scripts/stage_probe.sh <cores> [turnsPath] [reps]
# Replicates Bench.childBuild's child flags (taskset pin, fixed pre-touched
# ParallelGC heap, slim hadoop conf) and adds GRAFT_PROBE_STAGES +
# GRAFT_BUILD_TIMING so each build prints per-stage wall/cpu/gc/spill.
set -e
CORES=${1:-16}
TURNS=${2:-/dev/shm/graft-bench/turns-500000-s128}
REPS=${3:-1}
HEAP=$((768 * CORES))
[ $HEAP -lt 2048 ] && HEAP=2048
CP="/root/repo/target/scala-2.13/classes"
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
export SPARK_GRAFT_PROBE_REPS=$REPS
export SPARK_GRAFT_PROBE_DIR=/dev/shm/graft-bench/probe
export GRAFT_SLIM_HADOOP_CONF=1
export GRAFT_LOCAL_DIR=/dev/shm/graft-bench/spark-local
export GRAFT_PROBE_STAGES=1
export GRAFT_BUILD_TIMING=1
exec taskset -c 0-$((CORES - 1)) java -Xms${HEAP}m -Xmx${HEAP}m \
  -XX:+AlwaysPreTouch -XX:+UseParallelGC $OPENS \
  -Dspark.ui.enabled=false -cp "$CP" \
  graft.ops.ScalingProbe "$TURNS" "$CORES"
