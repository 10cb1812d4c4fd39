#!/bin/bash
# One CDC-only scaling sample (writes bench_cdc_sample.json), run with a
# plain JVM so sbt stays free for compiles/tests. Usage:
#   tools/cdc_sample.sh [events] [epochs]
set -e
cd "$(dirname "$0")/.."
EVENTS="${1:-16000000}"
EPOCHS="${2:-2}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_CDC_EVENTS="$EVENTS" \
SPARK_GRAFT_CDC_EPOCHS="$EPOCHS" \
exec java -Xmx8g $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
