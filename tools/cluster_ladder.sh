#!/usr/bin/env bash
# Scaling ladder under Spark's pseudo-cluster mode: N vs 4N REAL executor
# JVMs (separate processes, real RPC + netty shuffle between driver and
# executors), launched via spark-submit — the closest this sandbox gets
# to the north_rule's literal "N and 4N executors". Per-executor
# resources are held constant (4 cores, 10g) and only the executor COUNT
# varies, exactly like adding nodes to a cluster.
#
# Usage: tools/cluster_ladder.sh <repeat-tag> [tier] [replication] [order]
# Appends one JSON line per leg to bench/scale_r4_cluster_rep<tag>.jsonl.
# order=reverse runs the 4-executor leg first (each leg is its own JVM
# and efficiency is computed within-repeat, so leg order only changes
# which tenancy window each leg samples; disclosed per-repeat in BENCH.md).
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?repeat tag}"; TIER="${2:-bench}"; REP="${3:-4}"; ORDER="${4:-asc}"
JAR=target/scala-2.13/entity_resolutionspark_2.13-0.1.0.jar
OUT="bench/scale_r4_cluster_rep${TAG}.jsonl"
run_leg() { # $1 = n_executors, $2 = total cores
  echo "[ladder] local-cluster[$1,4,12288] ($2 total cores)" >&2
  SPARK_HOME=/opt/spark SPARK_LOCAL_IP=127.0.0.1 \
  SPARK_WORKER_DIR=/tmp/graft-spark-work \
  SPARK_GRAFT_MASTER="local-cluster[$1,4,12288]" \
  /opt/spark/bin/spark-submit \
    --master "local-cluster[$1,4,12288]" \
    --driver-memory 8g \
    --conf spark.executor.memory=10g \
    --conf spark.executor.extraJavaOptions="-XX:+UseParallelGC -XX:ParallelGCThreads=4" \
    --conf spark.ui.enabled=false \
    --class graft.BenchScale "$JAR" "$2" "$TIER" "$REP" \
    2>"/tmp/cluster_ladder_rep${TAG}_n$1.stderr" | grep '^{' >> "$OUT"
}
if [ "$ORDER" = "reverse" ]; then
  run_leg 4 16   # 4N executors
  run_leg 1 4    # N executors
else
  run_leg 1 4    # N executors
  run_leg 4 16   # 4N executors
fi
echo "[ladder] done -> $OUT" >&2
