#!/usr/bin/env bash
# spark-submit --py-files submission (north_star form). Usage:
#   scripts/submit_kg.sh <out_dir> [sf_dir] [master]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:?usage: submit_kg.sh <out_dir> [sf_dir] [master]}"
SF="${2:-/root/testdata/sf0.01}"
MASTER="${3:-local[${SPARK_GRAFT_CPUS:-8}]}"

ZIP="$(mktemp -d)/dygiepp_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" dygiepp_spark)

# single-threaded BLAS in every python worker (see BASELINE.md)
export OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1

spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --conf spark.ui.enabled=false \
  "$REPO/jobs/run_kg.py" --sf-dir "$SF" --out "$OUT"
