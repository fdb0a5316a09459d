#!/usr/bin/env bash
# Package the engine and run the KG build via spark-submit --py-files —
# the north_rule deployment shape.  On a cluster, point --master at it
# and size executors; everything else is identical.
#
#   tools/submit.sh [SF] [OUT_DIR] [MASTER]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF="${1:-0.01}"
OUT="${2:-/tmp/de_spark_submit_build}"
MASTER="${3:-local[8]}"

ZIP="$(mktemp -d)/de_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" de_spark -x '*.pyc' -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/tools/submit_build.py" "$SF" "$OUT"
