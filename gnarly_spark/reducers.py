"""Reducer API: the three canonical reducer shapes gnarly ships, as
declarative per-batch programs over change events.

Reference mapping (reducer registry at packages/gnarly-core/src/Gnarly.ts:22-28,
one runner per reducer; types at src/reducer/types.ts:18-42):

| shape      | reference reducer                                  | ours |
|------------|----------------------------------------------------|------|
| LWW upsert | erc721 ownership (reducer.ts:61-87)                | the pipeline's core pages table |
| fold       | erc20 running balance (reducer.ts:40-92)           | FoldReducer (MERGE-add, revert = negate) |
| append     | events / block-meta (reducer.ts:30-40 / :16-37)    | AppendReducer |

ReducerType semantics (types.ts:6-42): TimeVarying (order-dependent) maps to
the fold/LWW reducers — order is data ((warc_ts, op_seq)), so batches can be
processed set-wise; Atomic (parallelizable) maps to AppendReducer (stateless
projection); Idempotent (runs only at HEAD, never during sync,
ReducerRunner.ts:56-59) maps to `head_only=True`, executed by
`CdcIngestPipeline.refresh_idempotent()` after backfill instead of per batch.

Each reducer owns its own lake table / append dir and its own batch-id
idempotence, so a crash between sub-sinks of one micro-batch is repaired by
the refire: already-committed reducers skip, missing ones apply.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable


@dataclass
class AppendReducer:
    """Append-only projection (volatile rows: never fed back into state,
    excluded from replay — stores/sequelize.ts:286-288).

    project(events_df) -> rows to append for this batch.
    """

    name: str
    project: Callable[[DataFrame], DataFrame]
    head_only: bool = False
    # output DDL, used only for the before-first-batch empty read; None
    # keeps the old behavior (read raises until a batch has been applied)
    schema: str | None = None

    def out_dir(self, work_dir: str) -> str:
        return os.path.join(work_dir, "reducers", self.name)

    def apply(self, ctx, batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(self.out_dir(ctx.work_dir), f"batch={batch_id}")
        # refire guard keys on the _SUCCESS marker, not the directory: a
        # write that crashed mid-job leaves the dir (with _temporary only),
        # and a bare exists() check would skip the refire forever — silent
        # loss of the batch's append rows. mode('overwrite') makes the
        # re-write idempotent.
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        self.project(batch_df).write.mode("overwrite").parquet(path)

    def read(self, ctx) -> DataFrame:
        d = self.out_dir(ctx.work_dir)
        has_batches = os.path.isdir(d) and any(
            b.startswith("batch=") for b in os.listdir(d)
        )
        if not has_batches:
            # before the first micro-batch the glob read would crash with
            # PATH_NOT_FOUND — an empty relation is the truthful answer
            if self.schema is not None:
                return ctx.spark.createDataFrame([], self.schema)
            raise RuntimeError(
                f"AppendReducer {self.name!r}: no batches applied yet "
                "(pass schema=... for an empty read before the first batch)"
            )
        return ctx.spark.read.parquet(os.path.join(d, "batch=*"))


@dataclass
class FoldReducer:
    """Abelian fold into a per-key running total (erc20 shape).

    The fold must be commutative group arithmetic: reverts are handled by
    MERGE-adding the NEGATED contributions of reverted blocks (replaces
    patch inversion, utils.ts:77-103 — possible precisely because the
    state is abelian, SURVEY.md §7.4 risk 2).

    key: Column producing the group key (aliased 'key').
    delta: Column producing the signed numeric delta (null rows ignored).
    """

    name: str
    key: Column
    delta: Column
    head_only: bool = False

    def table(self, ctx) -> ParquetLakeTable:
        return ParquetLakeTable(
            ctx.spark, os.path.join(ctx.work_dir, "reducers", self.name), key="key"
        )

    def _contrib(self, events: DataFrame) -> DataFrame:
        """Per-key delta sums of a set of events (two-phase partial agg)."""
        rows = events.where(F.col("op") != "revert").select(
            self.key.alias("key"), self.delta.cast("double").alias("_d")
        )
        return rows.where(F.col("_d").isNotNull()).groupBy("key").agg(
            F.sum("_d").alias("delta")
        )

    def apply(self, ctx, batch_df: DataFrame, batch_id: int) -> None:
        from gnarly_spark.operators.replay import reverted_blocks
        from gnarly_spark.sinks.lake import bucket_of

        table = self.table(ctx)
        if batch_id in table.applied_batch_ids():
            return  # per-reducer refire guard
        reverted_now = reverted_blocks(batch_df)
        all_reverted = ctx.reverted_blocks()
        prior = ctx.log_before(batch_id)
        if prior is not None:
            # a re-delivered revert of an ALREADY-reverted block must not
            # negate its contributions a second time: only blocks whose
            # first retained revert is in THIS batch get negated
            reverted_now = reverted_now.join(
                F.broadcast(reverted_blocks(prior)), "block_hash", "left_anti"
            )
        # adds: this batch's events whose block isn't (already) dead
        adds = self._contrib(
            batch_df.join(F.broadcast(all_reverted), "block_hash", "left_anti")
        )
        # negations: PRIOR batches' events in blocks this batch reverts
        parts = [adds]
        if prior is not None:
            undone = prior.join(F.broadcast(reverted_now), "block_hash", "left_semi")
            parts.append(
                self._contrib(undone).select("key", (-F.col("delta")).alias("delta"))
            )
        net = parts[0]
        for p in parts[1:]:
            net = net.unionByName(p)
        # feeds the bucket-id collect AND the merged projection — cache for
        # the batch (released below) so the contrib aggregates run once
        net = net.groupBy("key").agg(F.sum("delta").alias("delta")).persist()
        try:
            # MERGE-add: total = coalesce(old,0) + delta. The pre-read opens
            # ONLY the buckets holding this batch's keys (<= n_buckets ids,
            # a bounded control-plane collect — the same class as merge's
            # own bucket routing): a full table.read() per micro-batch is
            # O(table) per trigger no matter how few keys the batch touches.
            current = None
            if table.current_version() >= 0:
                m = table._manifest()
                n = int(m.get("n_buckets", table.n_buckets))
                bids = [
                    r.b
                    for r in net.select(
                        bucket_of(F.col("key"), n).alias("b")
                    ).distinct().collect()
                ]
                current = table._read_snapshot(m, bids)
            if current is not None and "total" in current.columns:
                merged = net.join(current, "key", "left").select(
                    "key",
                    (F.coalesce(F.col("total"), F.lit(0.0)) + F.col("delta")).alias(
                        "total"
                    ),
                )
            else:
                merged = net.select("key", F.col("delta").alias("total"))
            table.merge(merged, batch_id=batch_id)
        finally:
            try:
                net.unpersist(blocking=False)
            except Exception:
                pass

    def read(self, ctx) -> DataFrame:
        return self.table(ctx).read()


@dataclass
class IdempotentReducer:
    """Head-only reducer (ReducerType.Idempotent, reducer/types.ts:6-16):
    recomputed from current state at HEAD, never during sync
    (ReducerRunner.ts:56-59). build(pages_df) -> snapshot DataFrame."""

    name: str
    build: Callable[[DataFrame], DataFrame]
    head_only: bool = True

    def apply(self, ctx, batch_df: DataFrame, batch_id: int) -> None:
        return  # never runs per-batch

    def refresh(self, ctx) -> DataFrame:
        out = self.build(ctx.pages())
        path = os.path.join(ctx.work_dir, "reducers", self.name)
        out.write.mode("overwrite").parquet(path)
        return ctx.spark.read.parquet(path)
