#!/bin/bash
# Probe-gated FULL bench (queries + CDC): launches when hypervisor
# steal under a busy probe is <1.5%. Writes bench_out.json.
set -e
cd "$(dirname "$0")/.."
MAX_MIN="${1:-120}"
DEADLINE=$(( $(date +%s) + MAX_MIN * 60 ))
NCPU=$(nproc)
while :; do
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  for _ in $(seq "$NCPU"); do timeout 5 sh -c 'while :; do :; done' & done
  wait
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  ST=$((s2 - s1))
  echo "[quiet] $(date +%T) busy-probe steal ticks over 5s x $NCPU cores: $ST"
  if [ "$ST" -lt $((NCPU * 500 * 15 / 1000)) ]; then
    echo "[quiet] host quiet -> FULL bench"
    ADD_OPENS=""
    for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
             java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
      ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
    done
    ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
    ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
    ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
    ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
    exec java -Xmx24g $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[quiet] gave up after $MAX_MIN min"; exit 1
  fi
  sleep 45
done
