#!/usr/bin/env bash
# Production-shaped entry: run the engine via spark-submit (the north rule's
# deployment contract). In this sandbox --master is local[N]; on a cluster
# substitute --master yarn|k8s://... --num-executors N --executor-cores C —
# every operator is partitioned/broadcast-shaped for multi-executor runs and
# nothing assumes a single JVM (see BENCH/BASELINE.md for the N-vs-4N
# scaling evidence).
#
# Usage: scripts/submit.sh [Bench|Verify|Plans|streaming.StreamMain] [args...]
#   scripts/submit.sh Bench                       # throughput + scaling JSON
#   scripts/submit.sh Verify /root/testdata/sf0.01 /tmp/out   # oracle dump
#   scripts/submit.sh streaming.StreamMain /data/transcripts /data/routed
#     # streamed route (incremental lifecycle MERGE) + exact conv counts;
#     # add --drain to process available input and exit
set -euo pipefail
cd "$(dirname "$0")/.."
CLASS="graft.${1:-Bench}"; shift || true
JAR=target/scala-2.13/logstashinputbbn_f5networksspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package
exec /opt/spark/bin/spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTS:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --class "$CLASS" "$JAR" "$@"
