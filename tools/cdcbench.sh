#!/bin/bash
# Manual one-parallelism CDC bench probe (mirrors what graft.Bench spawns).
# usage: cdcbench.sh <cores> <events> <epochs> [extra jvm args...]
# Writes its own binlog fixture under /dev/shm/graft-manual, then replays.
CORES=$1; EVENTS=$2; EPOCHS=$3; shift 3
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
LOG=/dev/shm/graft-manual/log
rm -rf /dev/shm/graft-manual
# fixture writer (any core count; untimed)
# GRAFT_TYPED=1 writes the typed struct-payload segment layout
taskset -c 0-31 java -XX:ActiveProcessorCount=32 $AO -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.BenchFixture "$EVENTS" "$EPOCHS" "$LOG" ${GRAFT_TYPED:+typed} || exit 1
exec taskset -c 0-$((CORES-1)) java -XX:ActiveProcessorCount=$CORES $AO \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@" \
  -cp "$CP" graft.Bench cdc-only $CORES $EVENTS $EPOCHS "$LOG"
