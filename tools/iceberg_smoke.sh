#!/usr/bin/env bash
# One-command verification of the Iceberg production sink on the FIRST
# networked environment (this sandbox has no network, so --packages cannot
# resolve the iceberg-spark-runtime jar here — the script is shipped
# untested-by-execution; the MERGE SQL + source schema it drives are
# contract-tested jar-free in tests/test_lake.py).
#
# Usage: tools/iceberg_smoke.sh [spark-submit]
#
# Creates a throwaway hadoop-catalog warehouse under $TMPDIR, runs the
# merge/refire/update+delete/evolve/time-travel/expire sequence in
# tools/iceberg_smoke_job.py, and diffs the SMOKE lines against the
# expected block below. Exit 0 == the production sink works end-to-end.
set -euo pipefail

SPARK_SUBMIT="${1:-spark-submit}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WAREHOUSE="$(mktemp -d "${TMPDIR:-/tmp}/iceberg_smoke.XXXXXX")"
trap 'rm -rf "$WAREHOUSE"' EXIT

# Pinned versions: Spark 4.x -> Scala 2.13 runtime artifact. For Spark 3.5
# clusters use iceberg-spark-runtime-3.5_2.12:1.6.1.
ICEBERG_PKG="org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"

# --py-files ships the library exactly as the production job does
# (tools/make_dist.sh builds the same zip the ingest job deploys with).
cd "$REPO" && zip -qr "$WAREHOUSE/gnarly_spark.zip" gnarly_spark

OUT="$WAREHOUSE/smoke.out"
"$SPARK_SUBMIT" \
  --packages "$ICEBERG_PKG" \
  --py-files "$WAREHOUSE/gnarly_spark.zip" \
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.lake.type=hadoop \
  --conf "spark.sql.catalog.lake.warehouse=$WAREHOUSE/wh" \
  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
  --conf spark.sql.shuffle.partitions=8 \
  "$REPO/tools/iceberg_smoke_job.py" | tee "$OUT"

EXPECTED="SMOKE initial_merge PASS
SMOKE refire_noop PASS
SMOKE merge_update_delete_insert PASS
SMOKE schema_evolution PASS
SMOKE time_travel PASS
SMOKE expire_snapshots PASS
SMOKE all PASS final_rows=960"

if diff <(grep '^SMOKE' "$OUT") <(printf '%s\n' "$EXPECTED"); then
  echo "ICEBERG SMOKE: OK"
else
  echo "ICEBERG SMOKE: OUTPUT MISMATCH" >&2
  exit 1
fi
