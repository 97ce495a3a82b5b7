"""One streaming-ingest scaling run: the FULL CDC pipeline (file-stream
changelog -> foreachBatch: LWW -> pandas-UDF extraction -> keyed MERGE into
the bucketed lake table, checkpointed) drained with availableNow at a given
core count. This is the BASELINE.json metric surface itself: change-events/s
sustained into the lake target.

Usage: python tools/streaming_scaling_job.py <cpus> <changelog_dir>
           <files_per_trigger> [retain|noretain]
Prints one JSON line {"cpus", "n_events", "n_batches", "wall_s",
"events_per_s", "pages", "pages_checksum", "replay_checksum", "retain_log"}.

`noretain` runs with retain_log=False (replayable source: the changelog
dir itself is the retained log, so the per-batch event-log append — the
disk-bound serial term on this one-virtual-disk box — is skipped).

The first drain (fresh work dir) warms JIT/codegen and the Python worker
pool; the timed drain runs in a second fresh work dir in the same JVM —
steady state, as a sustained ingest job runs. `replay_checksum` is the same
(url, warc_ts, text) checksum computed by one-shot batch replay of the same
changelog: equal checksums = incremental ingest == full replay at this scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _checksum(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("url", "warc_ts", "text").cast("decimal(38,0)"))
        .cast("string")
        .alias("chk"),
    ).collect()[0]


from gnarly_spark.sources.changelog import order_files_by_name  # noqa: E402


def drain(spark, changelog: str, files_per_trigger: int, n_buckets: int, retain_log: bool = True, dedup: bool = False):
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    work = tempfile.mkdtemp(prefix="ingest_scale_")
    target = ParquetLakeTable(
        spark, os.path.join(work, "pages"), key="url", n_buckets=n_buckets
    )
    p = CdcIngestPipeline(
        spark, work, target=target, retention_blocks=200, retain_log=retain_log,
        dedup_minhash=({} if dedup else None),
    )
    t0 = time.monotonic()
    q = p.start(changelog, available_now=True, max_files_per_trigger=files_per_trigger)
    q.awaitTermination()
    wall = time.monotonic() - t0
    return wall, p, work


def main():
    cpus = int(sys.argv[1])
    changelog = sys.argv[2]
    files_per_trigger = int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "retain"
    retain_log = mode != "noretain"
    dedup = mode == "dedup"

    from gnarly_spark.operators.replay import final_state
    from gnarly_spark.session import get_spark

    order_files_by_name(changelog)
    spark = get_spark(app_name=f"ingest_scale_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    log = spark.read.parquet(changelog)
    n = log.count()

    _, _, w0 = drain(spark, changelog, files_per_trigger, n_buckets=cpus, retain_log=retain_log, dedup=dedup)  # warm-up
    shutil.rmtree(w0, ignore_errors=True)
    # best-of-2 full drains: this VM shows minute-scale CPU-steal swings
    # (2x between runs); min over fresh drains approximates uncontended time
    wall, p, work = drain(spark, changelog, files_per_trigger, n_buckets=cpus, retain_log=retain_log, dedup=dedup)
    wall2, p2, work2 = drain(spark, changelog, files_per_trigger, n_buckets=cpus, retain_log=retain_log, dedup=dedup)
    if wall2 < wall:
        shutil.rmtree(work, ignore_errors=True)
        wall, p, work = wall2, p2, work2
    else:
        shutil.rmtree(work2, ignore_errors=True)

    got = _checksum(p.target.read().select("url", "warc_ts", "text"))
    want = _checksum(final_state(log).select("url", "warc_ts", "text"))
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n,
                "n_batches": len(p.metrics()),
                "wall_s": round(wall, 2),
                "events_per_s": round(n / wall, 1),
                "pages": got.n,
                "pages_checksum": got.chk,
                "replay_pages": want.n,
                "replay_checksum": want.chk,
                "retain_log": retain_log,
                "dedup": dedup,
                "n_dup_flags": (p.dup_flags().count() if dedup and p.dup_flags() is not None else None),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
