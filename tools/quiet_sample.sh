#!/bin/bash
# Probe-gated CDC sample: spin all cores for 5 s and measure hypervisor
# steal; only when steal is near-zero launch one cdc_sample.sh run.
# Steal is invisible on an idle guest, so the probe must be BUSY.
# Usage: tools/quiet_sample.sh [max_wait_minutes] [events] [epochs]
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
  echo "[quiet] $(date +%T) busy-probe steal ticks over 5s x $NCPU cores: $ST"
  # 5s * NCPU cores = NCPU*500 ticks total; accept < 1.5% stolen
  if [ "$ST" -lt $((NCPU * 500 * 15 / 1000)) ]; then
    echo "[quiet] host quiet -> sampling"
    exec tools/cdc_sample.sh "$EVENTS" "$EPOCHS"
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[quiet] gave up after $MAX_MIN min (steal stayed high)"
    exit 1
  fi
  sleep 45
done
