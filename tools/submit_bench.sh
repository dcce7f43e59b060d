#!/usr/bin/env bash
# Run the benchmark via spark-submit --py-files (the north rule's launch
# shape). Usage: tools/submit_bench.sh [cores] (default 32)
set -euo pipefail
cd "$(dirname "$0")/.."
CORES="${1:-32}"
mkdir -p dist
rm -f dist/edgar_spark.zip
(cd . && zip -qr dist/edgar_spark.zip edgar_spark -x '*__pycache__*')
exec spark-submit \
  --master "local[${CORES}]" \
  --py-files dist/edgar_spark.zip \
  --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-24g}" \
  bench.py
