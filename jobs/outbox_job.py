"""spark-submit entry point for the transactional-outbox export (lake
commits -> Debezium envelope JSONL; sources/debezium.py export_outbox):

    spark-submit --master <cluster> --py-files dist/gnarly_spark.zip \
        jobs/outbox_job.py --table /lake/pages_pipeline/pages \
        --out /feeds/pages_outbox [--key url] \
        [--follow SECONDS] [--source-name gnarly]

One-shot by default: export every commit since the recorded cursor and
exit with a JSON metrics line. ``--follow N`` polls every N seconds and
exports new commits as they land (the broker-less outbox tail — stop
with SIGINT; the cursor persists in the outbox dir, so the next run
resumes exactly where this one stopped). Per-version files + monotone
seqs are deterministic, so re-export after a crash is idempotent.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="ParquetLakeTable path")
    ap.add_argument("--out", required=True, help="envelope output dir")
    ap.add_argument("--key", default="url")
    ap.add_argument("--source-name", default="gnarly")
    ap.add_argument(
        "--follow", type=int, default=None, metavar="SECONDS",
        help="poll cadence for a continuous tail (default: one-shot)",
    )
    ap.add_argument(
        "--max-single-file-mb", type=int, default=256, metavar="MB",
        help="versions exporting more than this publish range-ordered "
        "v{N}-part-*.jsonl files plus a manifest instead of one file "
        "(the snapshot-bootstrap layout)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("gnarly_spark_outbox").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    tbl = ParquetLakeTable(spark, args.table, key=args.key)
    total_env, total_versions = 0, 0
    try:
        while True:
            r = export_outbox(
                tbl,
                args.out,
                source_name=args.source_name,
                max_single_file_bytes=args.max_single_file_mb << 20,
            )
            total_env += r["envelopes"]
            total_versions += len(r["exported_versions"])
            if args.follow is None:
                break
            time.sleep(args.follow)
    except KeyboardInterrupt:  # graceful tail stop: cursor already durable
        pass
    print(
        json.dumps(
            {
                "table": args.table,
                "out": args.out,
                "exported_versions": total_versions,
                "envelopes": total_env,
                "head_version": tbl.current_version(),
            }
        )
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
