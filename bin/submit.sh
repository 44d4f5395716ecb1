#!/usr/bin/env bash
# spark-submit wrapper for the graft engine mains.
#
#   bin/submit.sh <class> <master> <num-executors> [executor-cores] [executor-mem]
#
# Examples:
#   bin/submit.sh graft.Bench spark://master:7077 256 4 16g
#   bin/submit.sh graft.Verify yarn 64                 # + program args via EXTRA_ARGS
#
# The north-rule two-cluster-size measurement is this same submit run at
# --num-executors N and 4N on the same input; nothing in the engine keys
# off local mode.
set -euo pipefail

CLASS="${1:?class (e.g. graft.Bench)}"
MASTER="${2:?master url}"
EXECUTORS="${3:?num executors}"
CORES="${4:-4}"
MEM="${5:-16g}"

JAR=$(ls target/scala-2.13/pfaedlespark_2.13-*.jar 2>/dev/null | head -1)
if [ -z "${JAR}" ]; then
  echo "jar not found — run: sbt package" >&2
  exit 1
fi

# shuffle partitions ~ 2x total cores: large enough to bound per-partition
# state, small enough that AQE can coalesce without driver pressure
PARTS=$((EXECUTORS * CORES * 2))

exec spark-submit \
  --class "${CLASS}" \
  --master "${MASTER}" \
  --num-executors "${EXECUTORS}" \
  --executor-cores "${CORES}" \
  --executor-memory "${MEM}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${PARTS}" \
  --conf spark.sql.maxPlanStringLength=262144 \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  "${JAR}" ${EXTRA_ARGS:-}
