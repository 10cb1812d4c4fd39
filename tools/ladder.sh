#!/bin/bash
# Steal-gated 4-point thread-ladder run (8/16/24/32) — writes
# bench_ladder.json with per-rung throughput + inline CPU/DRAM probes
# and the thr-vs-DRAM-probe fit. Usage:
#   tools/ladder.sh [max_wait_minutes] [events] [epochs]
set -e
cd "$(dirname "$0")/.."
MAX_MIN="${1:-30}"
EVENTS="${2:-16000000}"
EPOCHS="${3:-2}"
DEADLINE=$(( $(date +%s) + MAX_MIN * 60 ))
NCPU=$(nproc)
probe_steal() {
  local s1 s2
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  for _ in $(seq "$NCPU"); do timeout 5 sh -c 'while :; do :; done' & done
  wait
  s2=$(awk '/^cpu /{print $9}' /proc/stat)
  echo $((s2 - s1))
}
while :; do
  ST=$(probe_steal)
  echo "[ladder] $(date +%T) busy-probe steal ticks over 5s x $NCPU cores: $ST"
  if [ "$ST" -lt $((NCPU * 500 * 15 / 1000)) ]; then
    echo "[ladder] host quiet -> running 4-point ladder"
    break
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[ladder] gave up after $MAX_MIN min (steal stayed high)"
    exit 1
  fi
  sleep 20
done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_LADDER=1 \
SPARK_GRAFT_CDC_EVENTS="$EVENTS" SPARK_GRAFT_CDC_EPOCHS="$EPOCHS" \
exec java -Xmx8g $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
