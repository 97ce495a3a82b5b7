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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable
from gnarly_spark.sources.lakefeed import LakeFeedDataSource


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
):
    """Start the replication stream; returns the StreamingQuery. A live
    mirror uses ``processing_time``. Restart with the same checkpoint to
    resume — offsets come from the checkpoint and refired batches are
    no-ops.

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
    only that batch). Loops start -> terminate until a run processes zero
    rows; with ``max_versions_per_trigger`` each run drains at most that
    many commits, so the loop is also the backpressured backfill shape.
    Returns {"runs", "rows"}."""
    runs = rows = 0
    while runs < max_runs:
        q = replicate_feed(
            spark,
            source_path,
            mirror,
            checkpoint,
            starting_version,
            available_now=True,
            max_versions_per_trigger=max_versions_per_trigger,
        )
        q.awaitTermination()
        runs += 1
        got = sum(int(p["numInputRows"]) for p in (q.recentProgress or []))
        rows += got
        if got == 0:
            return {"runs": runs, "rows": rows}
    raise RuntimeError(
        f"drain_feed: still ingesting after {max_runs} runs — the source "
        "is outpacing the drain; replicate live with processing_time"
    )
