"""spark-submit entry point for lake->lake replication over the change
feed (streaming/replicate.py over sources/lakefeed.py):

    spark-submit --master <cluster> \
        --py-files dist/gnarly_spark.zip \
        jobs/replicate_job.py \
        --source /lake/pages --mirror /lake/pages_mirror \
        --checkpoint /lake/pages_mirror_ck \
        [--starting-version 0] [--processing-time "10 seconds"] \
        [--max-versions-per-trigger 8] [--n-buckets 16] [--key url]

Default is a one-shot availableNow drain (catch the mirror up and exit
with one JSON metrics line); --processing-time runs a live tail.
Restarting with the same --checkpoint resumes; refired batches are
no-ops (the mirror records applied epoch ids per snapshot).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--mirror", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--starting-version", type=int, default=0)
    ap.add_argument("--processing-time", default=None)
    ap.add_argument("--max-versions-per-trigger", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--key", default="url")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # only stop a session this job itself created (see ingest_job.py)
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("gnarly_spark_replicate").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.streaming.replicate import replicate_feed

    mirror = ParquetLakeTable(
        spark, args.mirror, key=args.key, n_buckets=args.n_buckets
    )
    q = replicate_feed(
        spark,
        args.source,
        mirror,
        args.checkpoint,
        starting_version=args.starting_version,
        available_now=args.processing_time is None,
        processing_time=args.processing_time,
        max_versions_per_trigger=args.max_versions_per_trigger,
    )
    q.awaitTermination()
    print(
        json.dumps(
            {
                "mirror_version": mirror.current_version(),
                "mirror_rows": mirror.read().count(),
            }
        )
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
