"""Batch replay: changelog -> final pages table (the engine's core fold).

Replaces the reference's imperative patch-replay machinery
(Ourbit.resumeFromTxId at packages/gnarly-core/src/ourbit/Ourbit.ts:121-135,
rollback at :152-167, patch inversion at src/utils.ts:77-112) with a single
declarative program:

    exclude reverted blocks  (broadcast anti-join — the revert set is tiny,
                              bounded by the reorg-retention window)
    last-writer-wins per url (map-side-combining max_by aggregate)
    drop deleted urls
    extract text             (AFTER dedup — only winners pay the UDF)

Scale notes (100 TB / 10^10 events):
- ``max_by(struct(payload), struct(warc_ts, op_seq))`` is an ordinary
  aggregate, so Spark runs a *partial* aggregation before the shuffle:
  a hot url (Zipf head holding 10-20%% of events) is pre-reduced to one
  row per input partition before it ever crosses the wire. This is the
  two-phase local-then-global reduce the north_star asks for, and it is
  why the default path is max_by and not a window: ``row_number() OVER
  (PARTITION BY url ...)`` must co-locate ALL rows of the hot url on one
  task before ranking. The window variant is kept for comparison/tests.
- text extraction runs after LWW: at 10^10 events with ~10^8 live urls
  that is a 100x reduction in pandas-UDF work.
- filters/projections sit directly on the scan so Catalyst pushes them
  into parquet/Iceberg (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gnarly_spark.functions.extraction import extract_text_udf

# Columns of the final pages table (FIXTURES.md F1 / BASELINE.json input_hint)
PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def reverted_blocks(changelog: DataFrame) -> DataFrame:
    """Distinct block hashes named by revert events.

    The reorg analog of onBlockInvalidated (Blockstream.ts:179-194). By the
    retention invariant (ReducerRunner.ts:19 — reorgs deeper than N blocks
    cannot happen) this set is tiny relative to the changelog, so callers
    broadcast it.
    """
    return (
        changelog.where(F.col("op") == "revert")
        .where(F.col("revert_of_block").isNotNull())
        .select(F.col("revert_of_block").alias("block_hash"))
        .distinct()
    )


def live_events(changelog: DataFrame) -> DataFrame:
    """Non-revert events whose block was never reverted.

    Broadcast left-anti join: no shuffle of the big side.
    """
    rev = reverted_blocks(changelog)
    return changelog.where(F.col("op") != "revert").join(
        F.broadcast(rev), "block_hash", "left_anti"
    )


def scd2_history(events: DataFrame, key: str = "url") -> DataFrame:
    """SCD2 (slowly-changing-dimension type-2) version history per key:
    every live non-delete event becomes a version row with
    [valid_from, valid_to) interval and an is_current flag.

    Input is the live (revert-filtered) changelog; the reference keeps only
    HEAD state plus an ops log (ourbit/index.ts `Operation[]`), so history
    queries there mean replaying the log — this materializes the same
    lineage as a queryable table, the standard warehouse form.

    valid_to = event time of the NEXT live event for the key (deletes
    close the prior interval but emit no row); is_current = open interval.
    One window over (key, warc_ts/op_seq) — a single hash-shuffle on the
    key, same partitioning a downstream per-key MERGE would reuse. Per-key
    event counts are bounded by the crawl recrawl rate, so no salting is
    needed here (and intervals are inherently sequential per key).
    """
    payload = [c for c in events.columns if c not in (key, "op_seq", "op", "warc_ts")]
    w = Window.partitionBy(key).orderBy("warc_ts", "op_seq")
    return (
        events.withColumn("valid_to_ts", F.lead("warc_ts").over(w))
        .where(F.col("op") != "delete")
        .select(
            key,
            F.col("op_seq").alias("version_seq"),
            "op",
            F.col("warc_ts").alias("valid_from_ts"),
            "valid_to_ts",
            (F.col("valid_to_ts").isNull()).cast("int").alias("is_current"),
            *[c for c in payload if c != "valid_to_ts"],
        )
    )


def last_writer_wins(events: DataFrame, key: str = "url") -> DataFrame:
    """One winning event per key, ordered by (warc_ts, op_seq).

    Implemented as max_by over a struct ordering key => partial (map-side)
    aggregation handles hot-key skew without explicit salting. The winning
    row keeps ALL event columns. Replaces the reference's serialized
    apply-in-order loop (erc721 LWW at
    gnarly-reducer-erc721/src/reducer.ts:61-87).
    """
    payload = [c for c in events.columns if c != key]
    return (
        events.groupBy(key)
        .agg(
            F.max_by(
                F.struct(*payload), F.struct(F.col("warc_ts"), F.col("op_seq"))
            ).alias("_w")
        )
        .select(key, "_w.*")
    )


def last_writer_wins_salted(
    events: DataFrame, key: str = "url", n_salts: int = 32
) -> DataFrame:
    """Explicit two-phase salted LWW (north_star: 'salted key-partitioned
    merge apply + two-phase local-then-global reduce').

    Phase 1 reduces each (key, salt) locally; phase 2 reduces n_salts rows
    per key. Semantically identical to `last_writer_wins`; use when the
    partial-agg path is defeated (e.g. very wide payloads where hash-agg
    falls back to sort-agg) or to bound per-task state explicitly.
    """
    payload = [c for c in events.columns if c != key]
    ordk = F.struct(F.col("warc_ts"), F.col("op_seq"))
    phase1 = (
        events.withColumn("_salt", F.pmod(F.xxhash64(F.col("op_seq")), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.max_by(F.struct(*payload), ordk).alias("_w"))
        .select(key, "_w.*")
    )
    return (
        phase1.groupBy(key)
        .agg(F.max_by(F.struct(*payload), ordk).alias("_w"))
        .select(key, "_w.*")
    )


def last_writer_wins_fetch(events: DataFrame, key: str = "url") -> DataFrame:
    """Narrow-reduce-then-fetch LWW: aggregate only (key, warc_ts, op_seq)
    to find each key's winning ordering key, then select the winning ROWS
    with a broadcast semi-join on (key, warc_ts, op_seq).

    Same semantics as `last_writer_wins` ((warc_ts, op_seq) unique per key
    => exactly one row survives). Use when the payload is WIDE: the max_by
    aggregate is a TypedImperative SortAggregate, which sorts every input
    row — payload included — per partition; past executor memory that sort
    spills and falls off a cliff (measured 10M x 1.4KB html rows: 89 s
    max_by vs ~18 s this path on local[32]). Here the agg touches 24-byte
    rows and the wide rows stream through a map-side broadcast semi-join,
    never sorted, never shuffled.

    Scale bound: the winner-key list is one narrow row per live key — at
    10^8 urls ~5 GB, at the edge of broadcastability. The F.broadcast()
    below is a HARD hint (AQE never demotes it): past the 8 GB broadcast
    limit it throws rather than degrading, so at extreme key cardinality
    remove the hint (a plain semi-join lets AQE pick broadcast when small,
    shuffle when not) or use `last_writer_wins` (partial-agg), which
    remains the default for narrow payloads.
    """
    wk = events.groupBy(key).agg(
        F.max(F.struct("warc_ts", "op_seq")).alias("_wk")
    )
    sel = wk.select(
        F.col(key).alias("_k"),
        F.col("_wk.warc_ts").alias("_wts"),
        F.col("_wk.op_seq").alias("_wseq"),
    )
    # eqNullSafe on warc_ts: a winner whose warc_ts is NULL (max(struct)
    # still yields one) would never equi-join — the key silently vanished
    # from strategy='fetch' while 'maxby' kept it
    return events.join(
        F.broadcast(sel),
        (F.col(key) == F.col("_k"))
        & F.col("warc_ts").eqNullSafe(F.col("_wts"))
        & (F.col("op_seq") == F.col("_wseq")),
        "left_semi",
    )


def last_writer_wins_window(events: DataFrame, key: str = "url") -> DataFrame:
    """Window-based LWW variant (row_number = 1). Same semantics as
    `last_writer_wins`; kept for plan comparison — the window forces all
    rows of a key onto one task, so it loses on skewed keys (see module
    docstring). Tests assert both produce identical results.
    """
    w = Window.partitionBy(key).orderBy(F.desc("warc_ts"), F.desc("op_seq"))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def final_state(
    changelog: DataFrame, with_text: bool = True, strategy: str = "maxby"
) -> DataFrame:
    """Full-replay fold: the final pages table (FIXTURES.md F1).

    This is the batch-mode spec the streaming pipeline must agree with
    bit-for-bit (replay(log) == live state — the reference asserts exactly
    this at test/Ourbit.spec.ts:170-179).

    ``strategy``: 'maxby' (default — one-pass partial agg; fastest while the
    per-partition sort of full rows fits in memory) or 'fetch' (narrow
    reduce + broadcast semi-join; immune to the wide-row sort-spill cliff —
    8x faster at 10M x 1.4KB rows on local[32]). Both are semantically
    identical; pick 'fetch' when rows are wide and events-per-key is low.
    """
    lww = last_writer_wins_fetch if strategy == "fetch" else last_writer_wins
    winners = lww(live_events(changelog))
    pages = winners.where(F.col("op") != "delete")
    if with_text:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
        return pages.select(*PAGE_COLUMNS)
    return pages.select("url", "warc_ts", "html", "lang")
