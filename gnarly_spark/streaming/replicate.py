"""Lake -> lake replication over the change feed (the downstream consumer
the feed exists for): a Structured Streaming job reads
``format("lakefeed")`` from a source MOR table and applies each
micro-batch to a mirror ``ParquetLakeTable`` with the same exactly-once
machinery the ingest pipeline uses (checkpoint offsets + batch_id refire
guard), so the mirror converges to the source bit-for-bit — the
cross-region / bronze->silver replication shape at 100 TB (and the proof
that feed rows carry everything needed to reconstruct state).

Semantics per micro-batch (availableNow may pack MANY source commits
into one batch):
- a key can appear once per source commit, so the batch winner per key
  is the row with the highest ``_delta_seq`` (commit order is total);
- winner ``_op='delete'`` -> delete key, else upsert — intermediate
  versions inside the batch collapse away (same end state, less write);
- the mirror merge is stamped with the streaming epoch id, so a refired
  batch after a crash is a per-sink no-op.

Scale shape: one shuffle per batch (the max_by groupBy on the key, a
partial aggregation), then the mirror's keyed MERGE touching only
buckets with changed keys. No driver-side data, no per-row Python — the
feed's Arrow batches go straight into a JVM aggregate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable
from gnarly_spark.sources.lakefeed import LakeFeedDataSource, _published_version


def apply_feed_batch(batch: DataFrame, mirror: ParquetLakeTable, batch_id: int) -> bool:
    """Collapse one feed micro-batch to per-key winners and MERGE them
    into the mirror. Idempotent per (mirror, batch_id)."""
    if not batch.head(1):
        return False
    key = mirror.key
    data_cols = [c for c in batch.columns if c not in ("_op", "_delta_seq")]
    w = (
        batch.groupBy(key)
        .agg(
            F.max_by(
                F.struct("_op", *[c for c in data_cols if c != key]), "_delta_seq"
            ).alias("_w")
        )
        .select(key, "_w.*")
    )
    ups = w.where(F.col("_op") != "delete").drop("_op")
    dels = w.where(F.col("_op") == "delete").select(key)
    return mirror.merge(ups, delete_keys=dels, batch_id=batch_id)


def replicate_feed(
    spark: SparkSession,
    source_path: str,
    mirror: ParquetLakeTable,
    checkpoint: str,
    starting_version: int = 0,
    available_now: bool = True,
    processing_time: str | None = None,
    max_versions_per_trigger: int | None = None,
    consumed_base: int | None = None,
):
    """Start the replication stream; returns the StreamingQuery. A live
    mirror uses ``processing_time``. Restart with the same checkpoint to
    resume — offsets come from the checkpoint and refired batches are
    no-ops.

    ``consumed_base``: seed the reader with the checkpoint's resumed
    offset so ``max_versions_per_trigger`` caps the FIRST batch of a
    resumed run too (on resume Spark bypasses initialOffset, so the
    reader alone cannot know it and suspends the cap — drain_feed reads
    the offset log between runs and passes it here).

    ``available_now`` caveat: Python Data Source streams do not support
    Trigger.AvailableNow — Spark logs a warning and falls back to
    SINGLE-BATCH execution. On a fresh checkpoint that one batch covers
    the whole backlog, but a restart with a pending uncommitted batch
    replays just that batch and stops, leaving later commits undrained.
    Use :func:`drain_feed` when the contract is "everything committed so
    far is in the mirror when the call returns"."""
    spark.dataSource.register(LakeFeedDataSource)
    reader = (
        spark.readStream.format("lakefeed")
        .option("path", source_path)
        .option("startingVersion", starting_version)
    )
    if max_versions_per_trigger is not None:
        reader = reader.option("maxVersionsPerTrigger", max_versions_per_trigger)
    if consumed_base is not None:
        reader = reader.option("consumedBase", consumed_base)
    writer = reader.load().writeStream.foreachBatch(
        lambda df, epoch: apply_feed_batch(df, mirror, epoch)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def drain_feed(
    spark: SparkSession,
    source_path: str,
    mirror: ParquetLakeTable,
    checkpoint: str,
    starting_version: int = 0,
    max_versions_per_trigger: int | None = None,
    max_runs: int = 10_000,
) -> dict:
    """Replicate until the mirror has EVERYTHING committed so far, then
    return — the drain guarantee one availableNow start() cannot give for
    a Python Data Source stream (Spark falls back to single-batch
    execution; a restart with a pending uncommitted batch would replay
    only that batch). Loops start -> terminate until the checkpoint's
    offset reaches the source's published head — NOT until a run reads
    zero rows: a capped run covering only maintenance commits (compact /
    rebucket / skipped restores) legitimately processes 0 rows with data
    commits still beyond it. With ``max_versions_per_trigger`` each run
    drains at most that many commits (the cap is re-seeded from the
    offset log each run, so it holds on resumed checkpoints too) — the
    backpressured backfill shape. Returns {"runs", "rows"}."""
    head = _published_version(os.path.realpath(source_path))
    runs = rows = 0
    while runs < max_runs:
        base = _checkpoint_offset(checkpoint)
        if base is not None and base >= head:
            return {"runs": runs, "rows": rows}  # already drained
        # fresh checkpoint: seed the cap from startingVersion — reader
        # instances don't share state across the offset-planning calls, so
        # without a seed even a cold start's single batch is uncapped
        seed = base if base is not None else starting_version - 1
        q = replicate_feed(
            spark,
            source_path,
            mirror,
            checkpoint,
            starting_version,
            available_now=True,
            max_versions_per_trigger=max_versions_per_trigger,
            consumed_base=seed,
        )
        q.awaitTermination()
        runs += 1
        got = sum(int(p["numInputRows"]) for p in (q.recentProgress or []))
        rows += got
        done = _checkpoint_offset(checkpoint)
        if done is not None and done >= head:
            return {"runs": runs, "rows": rows}
        if done == base and got == 0:
            # nothing advanced and nothing read: the source has no
            # feed-visible commits beyond the offset (e.g. empty table,
            # or head <= startingVersion) — stop rather than spin
            return {"runs": runs, "rows": rows}
    raise RuntimeError(
        f"drain_feed: still ingesting after {max_runs} runs — the source "
        "is outpacing the drain; replicate live with processing_time"
    )


def _checkpoint_offset(checkpoint: str) -> int | None:
    """The last planned source offset in a streaming checkpoint's offset
    log (the resumed position of the next run), or None before any batch.
    Offset-log entries are line-oriented: a version header, a metadata
    JSON line, then one offset JSON per source — ours is the single
    lakefeed source, whose offset is {"version": N}."""
    d = os.path.join(checkpoint, "offsets")
    if not os.path.isdir(d):
        return None
    ids = [int(f) for f in os.listdir(d) if f.isdigit()]
    if not ids:
        return None
    with open(os.path.join(d, str(max(ids)))) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    off = json.loads(lines[-1])
    if isinstance(off, str):  # doubly-encoded JSON (serialized offset str)
        off = json.loads(off)
    return int(off["version"])
