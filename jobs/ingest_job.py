"""spark-submit entry point for the CDC ingest pipeline.

    spark-submit --master <cluster> \
        --py-files dist/gnarly_spark.zip \
        jobs/ingest_job.py \
        --changelog /data/changelog --work /lake/pages_pipeline \
        [--available-now | --processing-time "5 seconds"] \
        [--max-files-per-trigger 64] [--retention-blocks 100] \
        [--salt-partitions 32] [--no-retain-log] [--no-spread-batch] \
        [--files-per-bucket 8] [--compact-every 50] [--dedup-flags] \
        [--canonicalize-urls]

The SparkSession comes from spark-submit (master/executors configured
there); this script only sets SQL-level knobs. Prints one JSON line of
ingest metrics on exit. Restarting with the same --work dir resumes from
the checkpoint (crash recovery — no replay, state is in the lake table).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--changelog", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--processing-time", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--retention-blocks", type=int, default=100)
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--no-text", action="store_true")
    # replayable source (e.g. an immutable changelog dir / Iceberg
    # incremental read): skip the per-batch event-log append
    ap.add_argument("--no-retain-log", action="store_true")
    # batches already arrive well-partitioned (many files per trigger):
    # skip the entry repartition+cache
    ap.add_argument("--no-spread-batch", action="store_true")
    # parallel per-bucket COW rewrites (lake.py _write_buckets range split)
    ap.add_argument("--files-per-bucket", type=int, default=1, metavar="K")
    # MOR housekeeping cadence: fold outstanding deltas every N batches
    ap.add_argument("--compact-every", type=int, default=None, metavar="N")
    # in-pipeline near-dup flagging vs the persisted signature table
    # (defaults: k=8, bands=4, min_est_jaccard=0.5)
    ap.add_argument("--dedup-flags", action="store_true")
    # canonical url keys (functions/url.py): collapse messy crawl spellings
    # before the log append / merge
    ap.add_argument("--canonicalize-urls", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # only stop a session this job itself created: under spark-submit
    # getOrCreate makes one, but an embedder (tests, a driver program)
    # may already own the active session and must keep it
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("gnarly_spark_ingest").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    p = CdcIngestPipeline(
        spark,
        args.work,
        retention_blocks=args.retention_blocks,
        salt_partitions=args.salt_partitions,
        with_text=not args.no_text,
        retain_log=not args.no_retain_log,
        spread_batch=not args.no_spread_batch,
        files_per_bucket=args.files_per_bucket,
        compact_every=args.compact_every,
        dedup_minhash={} if args.dedup_flags else None,
        canonicalize_urls=args.canonicalize_urls,
    )
    q = p.start(
        args.changelog,
        available_now=args.available_now or not args.processing_time,
        max_files_per_trigger=args.max_files_per_trigger,
        processing_time=args.processing_time,
    )
    q.awaitTermination()
    m = p.metrics()
    print(
        json.dumps(
            {
                "batches": len(m),
                "events": sum(x["n_events"] for x in m),
                "pages": p.pages().count(),
                "target_version": p.target.current_version(),
            }
        )
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
