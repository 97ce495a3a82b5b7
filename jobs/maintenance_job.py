"""spark-submit maintenance job for the lake target: compaction + snapshot
expiry (the operational counterpart of jobs/ingest_job.py; ≈ Iceberg's
rewrite_data_files + expire_snapshots procedures).

    spark-submit --master <cluster> --py-files dist/gnarly_spark.zip \
        jobs/maintenance_job.py --table /lake/pages_pipeline/pages \
        [--keep-last 2] [--compact]

Run it between ingest runs (same work dir): snapshot expiry is
control-plane-only; compaction rewrites every bucket into one snapshot.
Prints one JSON line of what was reclaimed.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="ParquetLakeTable path")
    ap.add_argument("--key", default="url")
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gnarly_spark_maintenance").getOrCreate()

    from gnarly_spark.sinks.lake import ParquetLakeTable

    tbl = ParquetLakeTable(spark, args.table, key=args.key)
    out = {"table": args.table, "version_before": tbl.current_version()}
    if args.compact and tbl.current_version() >= 0:
        tbl.overwrite(tbl.read())  # one file per bucket, single snapshot
        out["compacted"] = True
    out.update(tbl.expire_snapshots(keep_last=args.keep_last))
    out["version_after"] = tbl.current_version()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
