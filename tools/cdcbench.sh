#!/bin/bash
# usage: cdcbench.sh <cores> <events> <epochs> [extra jvm args...]
CORES=$1; EVENTS=$2; EPOCHS=$3; shift 3
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')/root/repo/target/scala-2.13/classes"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
exec taskset -c 0-$((CORES-1)) java -XX:ActiveProcessorCount=$CORES $AO \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@" \
  -cp "$CP" graft.Bench cdc-only $CORES $EVENTS $EPOCHS
