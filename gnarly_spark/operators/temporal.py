"""As-of (temporal point-in-time) join: each probe row picks up the latest
version row for its key at-or-before the probe's timestamp.

The CDC product surface this serves: "what did page X look like when event E
touched it" — joining a read/interaction stream against the mutation
changelog's version history (the query-side complement of SCD2
``scd2_history`` in operators/replay.py; the reference answers this
imperatively by replaying its store to a txId, Ourbit.resumeFromTxId at
packages/gnarly-core/src/ourbit/Ourbit.ts:121-135).

Spark has no ASOF JOIN operator, and the naive encoding —
``probes JOIN versions ON key AND version_ts <= probe_ts`` then argmax —
fans out to |versions-per-key| rows per probe before reducing (quadratic in
version-chain length; a hot url with 10^4 versions multiplies its probes
10^4x). This implementation is the linear shape instead:

    union versions (tagged 0) and probes (tagged 1) on (key, t, tag)
    one window pass per key: last(version payload, ignorenulls=True)
      over rows unbounded-preceding..current
    keep probe rows

One shuffle (the window's partitionBy(key)), one per-key sort, zero row
amplification. Versions sharing (key, t) resolve to the highest seq —
the same LWW tie-break the replay path uses — because the sort places the
highest seq last among the ties. Probes with no prior version keep a null
payload (left-join semantics); a delete version carries a non-null payload
struct with a null value, so "deleted at probe time" (null value, non-null
seq) is distinguishable from "never existed" (null seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key: str = "url",
    probe_ts: str = "ts",
    version_ts: str = "warc_ts",
    payload: dict[str, "F.Column"] | None = None,
    seq_col: str = "op_seq",
) -> DataFrame:
    """For every probe row, attach ``payload`` columns from the latest
    version with ``version_ts <= probe_ts`` (ties at the same instant
    include the version: 'at or before'). Returns all probe columns plus
    the payload columns (null when no version precedes the probe).

    ``payload`` maps output column name -> expression over the version
    relation; default carries the version's seq and value. ``seq_col``
    orders versions at equal (key, version_ts) — highest wins (LWW).
    """
    if payload is None:
        payload = {"asof_seq": F.col(seq_col), "asof_value": F.col("value")}
    pay_names = list(payload)
    # a malformed version with NULL version_ts would sort FIRST (ASC
    # nulls-first) and serve its payload to every probe that precedes any
    # real version — those probes must report 'never existed' instead
    v = versions.where(F.col(version_ts).isNotNull()).select(
        F.col(key),
        F.col(version_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(seq_col).alias("_vseq"),
        F.struct(*[expr.alias(name) for name, expr in payload.items()]).alias("_pay"),
    )
    p = probes.withColumn("_t", F.col(probe_ts)).withColumn("_side", F.lit(1))
    u = v.unionByName(p, allowMissingColumns=True)
    # ROWS frame: every row sees all rows sorted before it. Versions sort
    # before probes at the same _t (_side 0 < 1), and among equal-_t
    # versions the highest _vseq sorts last => wins. Probe rows have null
    # _vseq; their mutual order is irrelevant (each only looks back).
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side", "_vseq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).select(
        *[c for c in probes.columns],
        *[F.col(f"_asof.{name}").alias(name) for name in pay_names],
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "INTERVAL 30 MINUTES",
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: per key, consecutive events closer than
    ``gap`` share a session; a strictly-larger gap starts a new one.
    Returns the input plus ``session_idx`` (0-based per key, in time order).

    The gap test compares timestamp differences as INTERVALs, never via
    epoch casts — microsecond-exact and engine-portable (cast-to-long
    truncates sub-second parts and diverges from an oracle computing exact
    diffs).

    Scale shape: ONE shuffle (hash on key) feeding two stacked window
    functions over the SAME (partition, order) spec — lag to flag session
    starts, running sum to number them — so Catalyst plans a single sort,
    and a per-key workload is linear in that key's events. This is the
    batch shape; Structured Streaming gets the same semantics from
    ``F.session_window(ts, gap)`` with a watermark.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(w)
    new_s = F.when(
        prev.isNull() | ((F.col(ts) - prev) > F.expr(gap)), 1
    ).otherwise(0)
    return (
        events.withColumn("_new_s", new_s)
        .withColumn("session_idx", F.sum("_new_s").over(run) - F.lit(1))
        .drop("_new_s")
    )


def sessionize_chunked(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "INTERVAL 30 MINUTES",
    tiebreak: str | None = None,
    chunk_seconds: int = 86400,
) -> DataFrame:
    """EXACTLY ``sessionize``, but scalable past hot keys: a key with 10^8
    events (bot traffic, a crawler's own fetch log) would serialize
    ``sessionize``'s single per-key window task. Here the per-EVENT window
    is partitioned by (key, time-chunk) — a hot key's events spread over
    as many tasks as it has active chunks — and sessions crossing a chunk
    boundary are stitched through a summary relation with ONE ROW PER
    (key, chunk): tiny regardless of event volume, so its per-key window
    is over chunk counts, not event counts.

    Stitch rule: chunk c's first session continues the previous non-empty
    chunk's last session iff first_ts(c) - last_ts(prev) <= gap (empty
    chunks between them fall out naturally — the summary has no row for
    them, and a gap spanning them exceeds ``gap`` by construction only
    when it actually does). Global index of local session j in chunk c =
    (total sessions in prior chunks) - (boundary merges so far, current
    chunk included) + j, which renumbers 0-based per key in time order —
    bit-identical to the single-window ``sessionize`` (property-tested).

    WHEN TO USE (measured, BENCH.md): ``sessionize`` is FASTER whenever
    the hottest chain fits a single sort task — on the bench box a 38M-row
    hot chain sorts in ~2.3s and this variant's extra shuffle/join costs
    3x that. Switch to chunked only when a key's chain exceeds what one
    task can hold at all (10^9-event bot/crawler keys: the single-window
    form fails, this one spreads the chain over chunk-count tasks).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    # tumbling-window start as the chunk id (works on TIMESTAMP_NTZ, which
    # cannot cast to a numeric epoch)
    e = events.withColumn(
        "_chunk", F.window(F.col(ts), f"{chunk_seconds} seconds").start
    )
    # local gap-islands within (key, chunk)
    wl = Window.partitionBy(key, "_chunk").orderBy(*order)
    runl = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(wl)
    new_s = F.when(prev.isNull() | ((F.col(ts) - prev) > F.expr(gap)), 1).otherwise(0)
    local = (
        e.withColumn("_new_s", new_s)
        .withColumn("_local_idx", F.sum("_new_s").over(runl) - F.lit(1))
        .drop("_new_s")
    )
    # one row per (key, chunk): the only relation whose window spans chunks
    summary = local.groupBy(key, "_chunk").agg(
        F.min(ts).alias("_first_ts"),
        F.max(ts).alias("_last_ts"),
        (F.max("_local_idx") + 1).alias("_n_sessions"),
    )
    wc = Window.partitionBy(key).orderBy("_chunk")
    runc = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_last = F.lag("_last_ts").over(wc)
    merged = F.when(
        prev_last.isNotNull() & ((F.col("_first_ts") - prev_last) <= F.expr(gap)), 1
    ).otherwise(0)
    offsets = (
        summary.withColumn("_merged", merged)
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n_sessions").over(wc.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            - F.sum("_merged").over(runc),
        )
        .select(key, "_chunk", "_offset")
    )
    return (
        local.join(offsets, [key, "_chunk"])
        .withColumn("session_idx", F.col("_offset") + F.col("_local_idx"))
        .drop("_chunk", "_local_idx", "_offset")
    )


def recrawl_schedule(
    changelog: DataFrame,
    as_of,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    seq_col: str = "op_seq",
    op_col: str = "op",
) -> DataFrame:
    """Change-rate recrawl planning (Cho & Garcia-Molina, TOIT 2003): from
    each url's observed mutation history, estimate its inter-change gap and
    rank how overdue a re-fetch is at ``as_of`` — the query that turns the
    CDC changelog into the crawler's frontier schedule.

    Per url, ONE groupBy (min/max/count/max_by — all partial-aggregating,
    so the shuffle carries one row per url per map partition):

      n_changes  observed content mutations (revert rows excluded upstream
                 of counting; a revert is pipeline bookkeeping, not a page
                 change)
      gap_s      greatest(span // (n-1), 1) — the MLE mean inter-change
                 interval in whole seconds (n >= 2); NULL for cold-start
                 urls seen once (no interval evidence)
      next_due   last change + gap_s
      overdue_score  ROUND(seconds_since_last / gap_s, 6) at as_of —
                 > 1 means past due; the frontier orders by it descending

    Urls whose LATEST op is a delete are dead pages and drop out (same
    max_by LWW tie-break as the replay path).

    Determinism contract (the catalog oracle replays this in SQL): all
    interval math is wall-clock integer seconds via timestampdiff on the
    NTZ values — no epoch conversion, so the driver's session timezone
    never enters — and the single float op is the final rounded division.
    """
    # whole-second precision up front: Spark's timestampdiff floors the
    # ELAPSED interval while other engines' date_diff counts boundary
    # crossings — on sub-second timestamps the two disagree by one; on
    # truncated ones they are identical (and recrawl cadence below one
    # second is not a thing)
    ts, seq = F.date_trunc("second", F.col(ts_col)), F.col(seq_col)
    per = (
        changelog.where(F.col(op_col) != "revert")
        .groupBy(F.col(url_col).alias("url"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
            F.max_by(F.col(op_col), seq).alias("_last_op"),
        )
        .where(F.col("_last_op") != "delete")
    )
    gap = F.when(
        F.col("n_changes") >= 2,
        F.greatest(
            F.expr(
                "CAST(timestampdiff(SECOND, first_ts, last_ts) AS BIGINT)"
                " div (n_changes - 1)"
            ),
            F.lit(1).cast("bigint"),
        ),
    )
    base = per.select(
        "url",
        "n_changes",
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_change"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_change"),
        gap.alias("gap_s"),
        F.expr(
            "timestampdiff(SECOND, last_ts,"
            f" CAST('{as_of}' AS TIMESTAMP_NTZ))"
        ).alias("_since"),
        F.col("last_ts"),
    )
    return base.select(
        "url",
        "n_changes",
        "first_change",
        "last_change",
        "gap_s",
        F.date_format(
            F.expr("timestampadd(SECOND, CAST(gap_s AS INT), last_ts)"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("next_due"),
        F.round(F.col("_since") / F.col("gap_s"), 6).alias("overdue_score"),
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    step_s: int,
    seq_col: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with forward fill (time-series gap fill):
    per key, one output row per ``step_s``-second grid instant between the
    key's first and last observation, each carrying the latest observed
    values at-or-before that instant — the operator that turns an irregular
    CDC/event history into the fixed-cadence series monitoring dashboards
    and training-feature windows consume (the reference answers "state at
    time T" imperatively by replaying to a txId,
    packages/gnarly-core/src/ourbit/Ourbit.ts:121-135; the grid variant is
    every T at once).

    Shape: grid instants are integer buckets of the epoch
    (k = floor(whole_seconds(ts) / step_s) — bucket math on date_trunc'd
    seconds so every engine agrees; see recrawl_schedule), generated per
    key with one tiny aggregate + ``sequence``/``explode`` (O(span/step)
    rows, no per-observation fan-out), then filled by the SAME linear
    union-window pass as :func:`asof_join` — one shuffle on key, one
    per-key sort, zero row amplification regardless of how many
    observations share a bucket. At 100 TB the grid relation is tiny
    relative to the events (span/step rows per key) and the single window
    is the one unavoidable shuffle.

    Ties at identical ``ts_col`` resolve to the highest ``seq_col`` (LWW,
    same rule as replay). Grid instants before the key's first observation
    cannot exist by construction (the grid starts at the first
    observation's bucket); the first bucket's instant can still precede a
    mid-bucket first observation, yielding NULLs (left-join semantics).

    Returns (key, grid_ts timestamp_ntz, <value_cols...>).
    """
    if seq_col is None:
        seq_col = ts_col
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    obs = df.where(F.col(ts_col).isNotNull())
    k = F.expr(
        f"CAST(timestampdiff(SECOND, {epoch}, date_trunc('second', {ts_col}))"
        f" AS BIGINT) div {int(step_s)}"
    )
    bounds = obs.groupBy(F.col(key)).agg(
        F.min(k).alias("_kmin"), F.max(k).alias("_kmax")
    )
    grid = bounds.select(
        F.col(key),
        F.explode(F.expr("sequence(_kmin, _kmax)")).alias("_k"),
    ).select(
        F.col(key),
        F.expr(
            f"timestampadd(SECOND, CAST(_k * {int(step_s)} AS BIGINT), {epoch})"
        ).alias("grid_ts"),
    )
    return asof_join(
        grid,
        obs,
        key=key,
        probe_ts="grid_ts",
        version_ts=ts_col,
        payload={c: F.col(c) for c in value_cols},
        seq_col=seq_col,
    )
