"""Custom stateful streaming operator via applyInPandasWithState.

The engine's canonical path keeps state in the lake table (MERGE per
micro-batch) — that is the right design for a 10^8-url table. This module
is the OTHER Spark-native stateful shape: keyed in-memory streaming state
with applyInPandasWithState, useful for small hot aggregates that must
update with per-trigger latency and don't warrant a table commit —
e.g. a per-url head tracker / change-rate monitor feeding ingest metrics
(the live analog of gnarly's per-reducer latest-transaction bookkeeping,
packages/gnarly-core/src/stores/sequelize.ts:257-270).

State per url: (n_events, last_seq, last_ts) folded with the same
(warc_ts, op_seq) LWW ordering as the table path. Arbitrary fold state is
supported by the same shape (the handler sees whole pandas groups).

Scale notes: state lives in the executors' state store keyed by url —
partitioned by the groupBy key, no driver involvement; a GroupStateTimeout
can bound it (we default to NoTimeout because the url universe of the hot
window is bounded by the reorg retention window upstream).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, last_seq long, last_ts timestamp"
OUTPUT_SCHEMA = "url string, n_events long, last_seq long, last_ts timestamp"


def _newer(top, last_seq, last_ts) -> bool:
    """(warc_ts, op_seq) total order with a null warc_ts as MINUS infinity
    (the table path's ORDER BY warc_ts DESC puts nulls last). Plain tuple
    comparison is unusable here: every comparison against NaT is False, so
    a NaT on EITHER side would freeze the head — a null-ts event could
    hijack the state and then no real event would ever beat it. A null
    op_seq folds to the -1 sentinel on BOTH sides (a NaN in the tuple
    would TypeError on a timestamp tie; the table path's op_seq DESC
    sorts nulls last, so a null loses ties there too)."""
    lo = pd.Timestamp.min
    new_key = (
        top.warc_ts if pd.notna(top.warc_ts) else lo,
        int(top.op_seq) if pd.notna(top.op_seq) else -1,
    )
    old_key = (
        last_ts if last_ts is not None and pd.notna(last_ts) else lo,
        last_seq if last_seq is not None else -1,
    )
    return new_key > old_key


def _fold_head(n, last_seq, last_ts, pdfs):
    """The per-url LWW fold both trackers share (review r05: it was
    duplicated verbatim in the v1 handler and the v2 processor, so every
    boundary fix had to land twice). Same total order as the table path:
    (warc_ts, op_seq); nulls sort FIRST so a NaT/NaN row can't shadow
    the batch's real maximum, and a winning null op_seq stores the -1
    sentinel — int(NaN) would kill the query (op_seq is nullable, and
    ONE null upcasts the pandas column to float64)."""
    for pdf in pdfs:
        n += len(pdf)
        top = pdf.sort_values(["warc_ts", "op_seq"], na_position="first").iloc[-1]
        if _newer(top, last_seq, last_ts):
            last_seq = int(top.op_seq) if pd.notna(top.op_seq) else -1
            last_ts = top.warc_ts
    return n, last_seq, last_ts


def _track_head(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one url into (n_events, last_seq,
    last_ts); emit the updated head row."""
    n, last_seq, last_ts = state.get if state.exists else (0, -1, None)
    n, last_seq, last_ts = _fold_head(n, last_seq, last_ts, pdfs)
    state.update((n, last_seq, last_ts))
    yield pd.DataFrame(
        {"url": [key[0]], "n_events": [n], "last_seq": [last_seq], "last_ts": [last_ts]}
    )


def head_tracker_v2(events, output_mode: str = "append", ttl_ms: int | None = None):
    """`head_tracker` on the MODERN stateful API (Spark 4
    transformWithStateInPandas + StatefulProcessor): same per-url
    (n_events, last_seq, last_ts) fold, but state lives in a named
    ValueState with an optional **TTL** — the state-bounding story the old
    applyInPandasWithState path lacks (there, eviction needs explicit
    timeout plumbing in the handler). At web scale the url universe is
    unbounded; `ttl_ms` evicts urls idle longer than the reorg-retention
    horizon, so the state store tracks the HOT set, not history.

    `output_mode` defaults to 'append' — the SAME default as
    head_tracker, so the advertised drop-in migration doesn't silently
    break file sinks (review r05: the defaults had diverged).

    TTL caveat: a TTL needs timeMode='ProcessingTime', and a
    ProcessingTime query NEVER self-terminates under
    trigger(availableNow=True) — timer maintenance keeps it alive after
    the input drains. Drain/backfill jobs should either skip the TTL or
    poll-and-stop (the pattern tests/test_stateful.py uses); `ttl_ms`
    must be a positive duration (0 is an invalid store config, rejected
    here rather than at query start).

    Requires the RocksDB state store provider (the only backend
    transformWithState supports):
      spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    Tests set it per-query via the session; an HDFS-backed store raises at
    start. Semantics vs head_tracker are asserted equal in
    tests/test_stateful.py (same input -> same final heads)."""
    if ttl_ms is not None and ttl_ms <= 0:
        raise ValueError(
            f"ttl_ms must be a positive duration, got {ttl_ms} (pass None "
            "for no TTL)"
        )
    import pandas as pd  # noqa: F811 - vectorized path only
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HeadProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._head = handle.getValueState(
                "head", STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._head.exists():
                n, last_seq, last_ts = self._head.get()
            else:
                n, last_seq, last_ts = 0, -1, None
            n, last_seq, last_ts = _fold_head(n, last_seq, last_ts, rows)
            self._head.update((n, last_seq, last_ts))
            yield pd.DataFrame(
                {
                    "url": [key[0]],
                    "n_events": [n],
                    "last_seq": [last_seq],
                    "last_ts": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.where(events.url.isNotNull())
        .groupBy("url")
        .transformWithStateInPandas(
            statefulProcessor=HeadProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode=output_mode,
            # TTL is clocked by the store, so it needs a time mode
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )


def head_tracker(events, output_mode: str = "append"):
    """events (streaming DataFrame with url/op_seq/warc_ts) -> per-url head
    state stream. ``output_mode='append'`` emits the updated head row each
    trigger a url appears (works with any sink, incl. files);
    ``'update'`` for update-capable sinks (memory/console/foreachBatch)."""
    return (
        events.where(events.url.isNotNull())
        .groupBy("url")
        .applyInPandasWithState(
            _track_head,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (SpaceSaving, Metwally et al. 2005) — bounded
# state for an UNBOUNDED key universe. The head trackers above keep one
# state row per url; at 1e10 urls that is the lake table's job, not a
# state store's. This operator answers the monitoring question ("which
# urls/hosts dominate the feed right now") with state capped at
# n_buckets x k counters TOTAL, independent of the key universe:
#
#  - items are hash-partitioned into `n_buckets` groups (the groupBy key),
#    so the buckets partition the item space DISJOINTLY;
#  - each bucket's StatefulProcessor keeps one SpaceSaving summary (k
#    counters in a ValueState of three parallel arrays) with the classic
#    guarantees: est >= true, est - err <= true, and any item with true
#    count > N_bucket/k is present;
#  - each trigger emits the bucket's current counters; the global top-k is
#    a plain batch top-k over the union — NO merge math needed, because
#    hash-disjoint buckets can never hold the same item.
#
# Per batch the processor folds the trigger's per-item counts (vectorized
# pandas groupby) into the summary in descending-count order with
# ascending-item tie-break — deterministic for a deterministic batch feed.
# ---------------------------------------------------------------------------

_TOPK_STATE = "items array<string>, counts array<bigint>, errs array<bigint>"
_TOPK_OUTPUT = (
    "bucket int, item string, est_count bigint, max_overcount bigint, "
    "bucket_n bigint"
)


def streaming_topk(
    events,
    item_col: str = "url",
    k: int = 32,
    n_buckets: int = 8,
    output_mode: str = "update",
):
    """Streaming heavy hitters: (bucket, item, est_count, max_overcount,
    bucket_n) per trigger, state bounded at n_buckets x k counters.
    Requires the RocksDB state store (transformWithState's only backend)
    AND google.protobuf importable in Spark's Python workers BEFORE the
    JVM starts (the TWS state client speaks protobuf; tests/conftest.py
    stages a vendored shim — production clusters just install protobuf).
    Global top-N = ORDER BY est_count DESC over the latest emissions
    (rows with each bucket's max bucket_n); buckets are hash-disjoint so
    no cross-bucket merge math is ever needed.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sum = handle.getValueState("summary", _TOPK_STATE)
            # cumulative item count the bucket has absorbed — rides along
            # so consumers get the SpaceSaving error bound (<= N_bucket/k)
            # and can identify a bucket's LATEST summary among appended
            # trigger emissions (max bucket_n)
            self._n = handle.getValueState("n_seen", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            if self._sum.exists():
                items, counts, errs = self._sum.get()
                state = {
                    it: [int(c), int(e)]
                    for it, c, e in zip(items, counts, errs)
                }
            else:
                state = {}
            batch = pd.concat(list(rows), ignore_index=True)
            # transformWithState hands EXPRESSION-derived projections to the
            # processor with positional column names (_0, _1 — names survive
            # only for native source columns), so bind by position: the
            # operator's projection is exactly (bucket_expr, item)
            batch.columns = ["_bucket", "_item"]
            per_item = (
                batch.groupby("_item").size().reset_index(name="_n")
                # descending count, ascending item: deterministic fold
                .sort_values(["_n", "_item"], ascending=[False, True])
            )
            for it, c in zip(per_item["_item"], per_item["_n"]):
                c = int(c)
                if it in state:
                    state[it][0] += c
                elif len(state) < k:
                    state[it] = [c, 0]
                else:
                    # evict the min-count counter (ascending item tiebreak);
                    # the newcomer inherits its count as overcount error
                    victim = min(state.items(), key=lambda kv: (kv[1][0], kv[0]))
                    vcnt = victim[1][0]
                    del state[victim[0]]
                    state[it] = [vcnt + c, vcnt]
            ordered = sorted(state.items(), key=lambda kv: (-kv[1][0], kv[0]))
            self._sum.update(
                (
                    [it for it, _ in ordered],
                    [v[0] for _, v in ordered],
                    [v[1] for _, v in ordered],
                )
            )
            n_seen = (self._n.get()[0] if self._n.exists() else 0) + len(batch)
            self._n.update((n_seen,))
            yield pd.DataFrame(
                {
                    "bucket": [int(key[0])] * len(ordered),
                    "item": [it for it, _ in ordered],
                    "est_count": [v[0] for _, v in ordered],
                    "max_overcount": [v[1] for _, v in ordered],
                    "bucket_n": [n_seen] * len(ordered),
                }
            )

        def close(self) -> None:
            pass

    keyed = events.where(F.col(item_col).isNotNull()).select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets))
        .cast("int")
        .alias("_bucket"),
        F.col(item_col).alias("_item"),
    )
    return keyed.groupBy("_bucket").transformWithStateInPandas(
        statefulProcessor=TopKProcessor(),
        outputStructType=_TOPK_OUTPUT,
        outputMode=output_mode,
        timeMode="None",
    )
