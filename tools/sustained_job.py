"""Sustained-ingest flatness evidence: ONE long availableNow drain of the
full CDC pipeline (file-stream -> foreachBatch: LWW -> pandas-UDF
extraction -> keyed MERGE into the bucketed lake) over a changelog 2x the
largest prior run, reporting PER-BATCH throughput.

The claim under test is the one that matters at 10^10 events: per-batch
events/s does not degrade batch-over-batch (no state accumulation, no
retained-log read amplification, no lake-manifest growth term inside the
hot path). A throughput table that is flat from batch 1 to batch B is the
single-box proxy for "sustained", complementing run_scaling.py's
two-parallelism-level efficiency evidence.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/sustained_job.py \
           [n_events] [cpus] [batches] [changelog_dir]
Prints one JSON line:
  {"n_events", "cpus", "batches": [{batch_id, n_events, wall_s,
   events_per_s, phase_s}...], "wall_s", "events_per_s",
   "flatness_last_over_first", "pages", "pages_checksum",
   "replay_checksum"}

A 1M-event warm-up drain (own work dir, same JVM) absorbs JIT/codegen and
Python-worker startup so batch 1 of the timed drain is steady-state.
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


def _drain(spark, changelog: str, files_per_trigger: int, cpus: int, mode: str = "cow"):
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    work = tempfile.mkdtemp(prefix="sustained_")
    target = ParquetLakeTable(
        spark, os.path.join(work, "pages"), key="url", n_buckets=cpus, mode=mode
    )
    p = CdcIngestPipeline(
        spark, work, target=target, retention_blocks=200,
        compact_every=(4 if mode == "mor" else None),
    )
    t0 = time.monotonic()
    q = p.start(changelog, available_now=True, max_files_per_trigger=files_per_trigger)
    q.awaitTermination()
    return time.monotonic() - t0, p, work


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    changelog = (
        sys.argv[4] if len(sys.argv) > 4 else f"/tmp/sustained/changelog_{n_events}"
    )
    warm = "/tmp/sustained/changelog_warm"
    n_files = n_batches * 8  # 8 source files per trigger

    from gnarly_spark.datagen import gen_changelog_spark
    from gnarly_spark.operators.replay import final_state
    from gnarly_spark.session import get_spark
    from gnarly_spark.sources.changelog import order_files_by_name

    spark = get_spark(app_name="sustained", cpus=cpus, shuffle_partitions=cpus)
    # repartitionByRange(op_seq): file NAME order == op_seq order, so the
    # mtime stamping below makes the file source honor the changelog's
    # total-order contract with revert rows interleaved where a real WAL
    # puts them (a plain parallel write lands reverts in the last files,
    # which the pipeline rightly fails fast on as an ordering violation)
    if not os.path.exists(changelog):
        gen_changelog_spark(spark, n_events, skew=0.2).repartitionByRange(
            n_files, "op_seq"
        ).sortWithinPartitions("op_seq").write.parquet(changelog)
    if not os.path.exists(warm):
        gen_changelog_spark(spark, 1_000_000, skew=0.2).repartitionByRange(
            8, "op_seq"
        ).sortWithinPartitions("op_seq").write.parquet(warm)
    order_files_by_name(changelog)
    order_files_by_name(warm)

    _, _, w0 = _drain(spark, warm, 8, cpus)  # warm-up: JIT + worker pool
    shutil.rmtree(w0, ignore_errors=True)

    mode = os.environ.get("SUSTAINED_MODE", "cow")
    wall, p, work = _drain(spark, changelog, 8, cpus, mode=mode)
    batches = [
        {k: m[k] for k in ("batch_id", "n_events", "wall_s", "events_per_s", "phase_s") if k in m}
        for m in p.metrics()
    ]
    # flatness: throughput of the last THIRD of batches over the first
    # third (single batches swing with this VM's CPU steal; thirds smooth)
    third = max(1, len(batches) // 3)
    first = sum(b["n_events"] for b in batches[:third]) / sum(
        b["wall_s"] for b in batches[:third]
    )
    last = sum(b["n_events"] for b in batches[-third:]) / sum(
        b["wall_s"] for b in batches[-third:]
    )

    # undo-append burst attribution (VERDICT r04 #6): seconds alone can't
    # tell "bigger batch" from "slow disk" — rows/bytes now ride in the
    # metrics, so report per-batch MB/s and the max/median wall ratio.
    # Note undo_log wall time also absorbs the lazy LWW materialization
    # (first downstream action), so MB/s is a lower bound on write speed.
    import statistics

    undo_s = [b["phase_s"].get("undo_log", 0.0) for b in batches]
    undo_b = [b["phase_s"].get("undo_bytes", 0) for b in batches]
    undo = None
    if any(undo_s):
        med = statistics.median([s for s in undo_s if s]) or 1e-9
        undo = {
            "per_batch_s": [round(s, 2) for s in undo_s],
            "per_batch_mb": [round(x / 1e6, 1) for x in undo_b],
            "per_batch_mb_per_s": [
                round(x / 1e6 / max(s, 1e-9), 1) for x, s in zip(undo_b, undo_s)
            ],
            "max_over_median_s": round(max(undo_s) / med, 2),
        }

    got = _checksum(p.target.read().select("url", "warc_ts", "text"))
    want = _checksum(
        final_state(spark.read.parquet(changelog)).select("url", "warc_ts", "text")
    )
    total = sum(b["n_events"] for b in batches)
    print(
        json.dumps(
            {
                "mode": mode,
                "n_events": total,
                "cpus": cpus,
                "batches": batches,
                "wall_s": round(wall, 2),
                "events_per_s": round(total / wall, 1),
                "flatness_last_over_first": round(last / first, 3),
                "undo_append": undo,
                "pages": got.n,
                "pages_checksum": got.chk,
                "replay_pages": want.n,
                "replay_checksum": want.chk,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
