#!/usr/bin/env bash
# Package the engine and run the feature-matrix job via spark-submit
# --py-files (north rule's ship shape). Local-mode example; on a cluster,
# swap --master and add executor confs.
#
# Usage: scripts/run_submit.sh <events_parquet_dir> <out_dir> [extra args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
EVENTS="${1:?events parquet dir}"
OUT="${2:?output dir}"
shift 2

ZIP="$(mktemp -d)/bgp_feature_extractor_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" bgp_feature_extractor_spark -x '*__pycache__*')

spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-64}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_job.py" --events "$EVENTS" --out "$OUT" "$@"
