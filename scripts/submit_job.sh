#!/usr/bin/env bash
# Package the engine and submit a tile job to a cluster
# (north-rule deployment shape: spark-submit --py-files at N and 4N
# executors).  Local sandbox run:
#
#   scripts/submit_job.sh job.json local[8]
#
# Cluster run (no code changes — only the master/deploy args differ):
#
#   scripts/submit_job.sh job.json yarn --num-executors 256
set -euo pipefail
SPEC="${1:?usage: submit_job.sh <job.json> [master] [extra spark-submit args...]}"
MASTER="${2:-local[*]}"
shift; [ $# -gt 0 ] && shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/mapchete_xarray_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" mapchete_xarray_spark)
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-200}" \
  "$@" \
  "$REPO/scripts/run_job.py" "$SPEC"
