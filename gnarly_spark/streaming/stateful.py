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
    hijack the state and then no real event would ever beat it."""
    lo = pd.Timestamp.min
    new_key = (top.warc_ts if pd.notna(top.warc_ts) else lo, top.op_seq)
    old_key = (
        last_ts if last_ts is not None and pd.notna(last_ts) else lo,
        last_seq,
    )
    return new_key > old_key


def _track_head(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one url into (n_events, last_seq,
    last_ts); emit the updated head row."""
    n, last_seq, last_ts = state.get if state.exists else (0, -1, None)
    for pdf in pdfs:
        n += len(pdf)
        # same total order as the table path: (warc_ts, op_seq); nulls
        # sort FIRST so a NaT row can't shadow the batch's real maximum
        top = pdf.sort_values(["warc_ts", "op_seq"], na_position="first").iloc[-1]
        if _newer(top, last_seq, last_ts):
            last_seq = int(top.op_seq)
            last_ts = top.warc_ts
    state.update((n, last_seq, last_ts))
    yield pd.DataFrame(
        {"url": [key[0]], "n_events": [n], "last_seq": [last_seq], "last_ts": [last_ts]}
    )


def head_tracker_v2(events, output_mode: str = "update", ttl_ms: int | None = None):
    """`head_tracker` on the MODERN stateful API (Spark 4
    transformWithStateInPandas + StatefulProcessor): same per-url
    (n_events, last_seq, last_ts) fold, but state lives in a named
    ValueState with an optional **TTL** — the state-bounding story the old
    applyInPandasWithState path lacks (there, eviction needs explicit
    timeout plumbing in the handler). At web scale the url universe is
    unbounded; `ttl_ms` evicts urls idle longer than the reorg-retention
    horizon, so the state store tracks the HOT set, not history.

    Requires the RocksDB state store provider (the only backend
    transformWithState supports):
      spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    Tests set it per-query via the session; an HDFS-backed store raises at
    start. Semantics vs head_tracker are asserted equal in
    tests/test_stateful.py (same input -> same final heads)."""
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
            for pdf in rows:
                n += len(pdf)
                top = pdf.sort_values(
                    ["warc_ts", "op_seq"], na_position="first"
                ).iloc[-1]
                if _newer(top, last_seq, last_ts):
                    last_seq = int(top.op_seq)
                    last_ts = top.warc_ts
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
            timeMode="ProcessingTime" if ttl_ms else "None",
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
