"""Event-time windowed aggregation over the changelog stream with
watermark-bounded state — the Structured Streaming form of the batch
``w_tumbling_hourly`` query (catalog.py).

The reference processes strictly in arrival order and has no event-time
notion at all (blocks arrive ordered, Blockstream.ts:60-143); a web-crawl
changelog is event-timed (warc_ts) and arrives late and out of order, so
the Spark-first shape is ``withWatermark`` + ``groupBy(window(...))``:

* state for a window is dropped once the watermark (max observed event
  time minus the allowed lateness) passes the window end — without it a
  10^10-event stream accretes unbounded window state;
* events older than the watermark are dropped deterministically (counted
  by the engine as late rows) instead of corrupting long-closed windows;
* the aggregation itself partial-aggregates map-side per micro-batch, so
  the shuffle per trigger carries one row per (window, lang) per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_rollup(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization: ``F.session_window(ts, gap)``
    merges events of one key whose timestamps fall within ``gap`` of the
    growing session window, with watermark-bounded state — the Structured
    Streaming twin of batch operators/temporal.sessionize (same
    semantics; boundary nuance: an EXACTLY-gap spacing starts a new
    session here, window-merge is strict-less-than, so the batch twin is
    ``ts - prev >= gap`` starts-new).

    Output: (key, session_start, session_end, n_events) where start/end
    are the session's real MIN/MAX event times (the session window's
    ``end`` is last_ts + gap — an implementation artifact we don't leak).

    Scale shape: per micro-batch this partial-aggregates map-side into
    per-key session state; state for a session is dropped once the
    watermark passes its end (without it a 10^10-event stream accretes
    every bot session forever). Works on batch DataFrames too
    (withWatermark is a no-op there) — same code path for backfill.
    In streaming append mode a session only EMITS once the watermark
    passes it; drain patterns append a far-future flush row per the
    w_stream_sessionize catalog query."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("sw"), key)
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(key, "session_start", "session_end", "n_events")
    )


def windowed_lang_rates(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-language page-change rates in event-time tumbling windows.

    Works on both a streaming and a batch DataFrame (withWatermark is a
    no-op in batch — the same code path serves backfill and live tail).
    Output: (window_start, window_end, lang, n_changes, n_urls).
    """
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_len).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            # approx HLL, not exact distinct: per-window exact distincts
            # re-shuffle per url; the sketch merges map-side
            F.approx_count_distinct("url").alias("n_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_changes",
            "n_urls",
        )
    )
