"""As-of join semantics on a planted version chain (the oracle-equivalence
check runs via tools/check_oracle.py / the driver gate: cdc_asof_join)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    versions = spark.createDataFrame(
        [
            ("a", _ts("2020-01-01T00:00:00"), 1, "insert", 10.0),
            ("a", _ts("2020-01-03T00:00:00"), 2, "update", 20.0),
            # two versions at the SAME instant: higher op_seq must win
            ("a", _ts("2020-01-03T00:00:00"), 3, "update", 30.0),
            ("a", _ts("2020-01-05T00:00:00"), 4, "delete", 99.0),
            ("b", _ts("2020-01-02T00:00:00"), 5, "insert", 50.0),
        ],
        schema="url string, warc_ts timestamp, op_seq long, op string, value double",
    )
    probes = spark.createDataFrame(
        [
            (100, "a", _ts("2019-12-31T00:00:00")),  # before any version
            (101, "a", _ts("2020-01-02T00:00:00")),  # after v1
            (102, "a", _ts("2020-01-03T00:00:00")),  # exactly at v2/v3 tie
            (103, "a", _ts("2020-01-04T00:00:00")),  # after the tie
            (104, "a", _ts("2020-01-06T00:00:00")),  # after the delete
            (105, "b", _ts("2020-01-02T00:00:00")),  # exactly at b's insert
            (106, "c", _ts("2020-01-02T00:00:00")),  # key never written
        ],
        schema="probe_seq long, url string, ts timestamp",
    )
    return probes, versions


def test_asof_join_picks_latest_at_or_before(spark, frames):
    from gnarly_spark.operators.temporal import asof_join

    probes, versions = frames
    got = (
        asof_join(
            probes,
            versions,
            payload={
                "asof_seq": F.col("op_seq"),
                "asof_value": F.when(F.col("op") != "delete", F.col("value")),
            },
        )
        .toPandas()
        .set_index("probe_seq")
        .sort_index()
    )
    import pandas as pd

    assert pd.isna(got.loc[100].asof_seq)  # no version yet
    assert got.loc[101].asof_seq == 1 and got.loc[101].asof_value == 10.0
    # 'at or before' includes the same instant; op_seq breaks the tie
    assert got.loc[102].asof_seq == 3 and got.loc[102].asof_value == 30.0
    assert got.loc[103].asof_seq == 3
    # deleted at probe time: seq present, value tombstoned
    assert got.loc[104].asof_seq == 4 and pd.isna(got.loc[104].asof_value)
    assert got.loc[105].asof_seq == 5
    assert pd.isna(got.loc[106].asof_seq)  # key never existed


def test_sessionize_gap_islands(spark):
    from gnarly_spark.operators.temporal import sessionize

    rows = [
        ("u1", _ts("2020-01-01T00:00:00"), 1),
        ("u1", _ts("2020-01-01T00:29:59"), 2),  # 29:59 gap -> same session
        ("u1", _ts("2020-01-01T00:59:59"), 3),  # exactly 30:00 -> same (strict >)
        ("u1", _ts("2020-01-01T01:30:00"), 4),  # 30:01 -> new session
        ("u2", _ts("2020-01-01T00:00:00"), 5),
    ]
    e = spark.createDataFrame(rows, schema="user_id string, ts timestamp, event_id long")
    got = (
        sessionize(e, tiebreak="event_id")
        .toPandas()
        .set_index("event_id")
        .session_idx.to_dict()
    )
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}


def test_sessionize_one_shuffle_one_sort(spark):
    """Two stacked windows over the same (partition, order) spec must plan
    a single exchange and a single sort."""
    from gnarly_spark.operators.temporal import sessionize

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    plan = (
        sessionize(e, tiebreak="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 1 or plan.count("+- Sort") == 1


def test_asof_join_is_single_shuffle_no_join(spark, frames):
    """The linear shape: ONE hash exchange on the key feeding a window —
    never a join that fans each probe out to its key's whole version
    chain."""
    from gnarly_spark.operators.temporal import asof_join

    probes, versions = frames
    plan = (
        asof_join(probes, versions)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_asof_join_matches_pandas_merge_asof_property(spark):
    """Fuzz vs an INDEPENDENT implementation: pandas.merge_asof
    (direction='backward', allow_exact_matches=True) on random keyed
    version/probe sets must agree with the union+window asof_join.
    Version timestamps are made unique per key (merge_asof's tie rule
    among equal version times is positional, ours is max-seq; dedup to
    the max-seq row first — same contract the catalog oracle uses)."""
    import numpy as np
    import pandas as pd

    from gnarly_spark.operators.temporal import asof_join

    rng = np.random.default_rng(42)
    for trial in range(3):
        nk, nv, np_ = 5, 60, 40
        v = pd.DataFrame(
            {
                "url": [str(x) for x in rng.integers(0, nk, nv)],
                "warc_ts": pd.to_datetime(
                    rng.integers(0, 1000, nv) * 3600, unit="s"
                ),
                "op_seq": np.arange(nv, dtype="int64"),
                "value": rng.normal(size=nv).round(3),
            }
        )
        p = pd.DataFrame(
            {
                "probe_seq": np.arange(np_, dtype="int64"),
                "url": [str(x) for x in rng.integers(0, nk, np_)],
                "ts": pd.to_datetime(rng.integers(0, 1000, np_) * 3600, unit="s"),
            }
        )
        # LWW-dedup equal (url, warc_ts) to max op_seq (the tie contract)
        vd = v.sort_values("op_seq").groupby(["url", "warc_ts"], as_index=False).last()
        expected = pd.merge_asof(
            p.sort_values("ts", kind="stable"),
            vd.sort_values("warc_ts")[["url", "warc_ts", "op_seq", "value"]],
            left_on="ts",
            right_on="warc_ts",
            by="url",
            direction="backward",
            allow_exact_matches=True,
        ).set_index("probe_seq")
        got = (
            asof_join(
                spark.createDataFrame(
                    p, schema="probe_seq long, url string, ts timestamp"
                ),
                spark.createDataFrame(
                    v,
                    schema="url string, warc_ts timestamp, op_seq long, value double",
                ),
            )
            .toPandas()
            .set_index("probe_seq")
        )
        import pandas.testing as pdt

        pdt.assert_series_equal(
            got.asof_seq.sort_index(),
            expected.op_seq.sort_index().rename("asof_seq"),
            check_dtype=False,
        )
        pdt.assert_series_equal(
            got.asof_value.sort_index(),
            expected.value.sort_index().rename("asof_value"),
            check_dtype=False,
        )


def test_sessionize_agrees_with_native_session_window(spark):
    """Cross-validate the gap-island implementation against Spark's own
    F.session_window (the Structured Streaming primitive): identical
    (user, session_start, n_events) multiset. (Boundary semantics differ
    only for a gap of EXACTLY 30:00 — native merges on strict overlap,
    ours on <= — and the fixture data has no such gap, asserted below.)"""
    from gnarly_spark.operators.temporal import sessionize

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    from pyspark.sql import Window as W

    prev = F.lag("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    boundary = (
        e.withColumn("_d", F.col("ts") - prev)
        .where(F.col("_d") == F.expr("INTERVAL 30 MINUTES"))
        .count()
    )
    assert boundary == 0  # precondition for exact agreement
    ours = (
        sessionize(e, tiebreak="event_id")
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("s"), F.count("*").alias("n"))
        .select("user_id", "s", "n")
        .toPandas()
        .sort_values(["user_id", "s"])
        .reset_index(drop=True)
    )
    native = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
        .toPandas()
        .sort_values(["user_id", "s"])
        .reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(ours, native, check_dtype=False)


def test_sessionize_chunked_equals_plain_property(spark):
    """The chunked (hot-key-scalable) sessionize must be bit-identical to
    the single-window form for random event sets — including a hot key
    holding half the events, boundary-hugging timestamps, and chunk
    widths SMALLER than the gap (stitching across empty chunks)."""
    import numpy as np
    import pandas as pd

    from gnarly_spark.operators.temporal import sessionize, sessionize_chunked

    rng = np.random.default_rng(7)
    n = 600
    users = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 20, n))
    pdf = pd.DataFrame(
        {
            "user_id": [str(u) for u in users],
            # cluster timestamps so both merges and splits occur
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 40, n)) * 1800
                + rng.integers(0, 3600, n),
                unit="s",
            ),
            "event_id": np.arange(n, dtype="int64"),
        }
    )
    e = spark.createDataFrame(
        pdf, schema="user_id string, ts timestamp, event_id long"
    )
    base = (
        sessionize(e, tiebreak="event_id")
        .toPandas()
        .set_index("event_id")
        .session_idx.sort_index()
    )
    for cs in (900, 3600, 7200):
        got = (
            sessionize_chunked(e, tiebreak="event_id", chunk_seconds=cs)
            .toPandas()
            .set_index("event_id")
            .session_idx.sort_index()
        )
        assert got.equals(base), f"chunk_seconds={cs} diverged"


def test_recrawl_schedule_hand_computed(spark):
    """u1: changes at 00:00, 01:00, 03:00 -> gap = 10800//2 = 5400s,
    next_due 04:30, score at 06:00 = 10800/5400 = 2.0. u2 seen once ->
    cold-start NULLs. u3's latest op is delete -> dead, dropped. u4's
    changes share one timestamp -> gap clamps to 1 (no div-by-zero)."""
    import datetime as dt

    from gnarly_spark.operators.temporal import recrawl_schedule

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def at(h, m=0):
        return t0 + dt.timedelta(hours=h, minutes=m)

    rows = [
        (1, "u1", "insert", at(0)),
        (2, "u1", "update", at(1)),
        (3, "u1", "update", at(3)),
        (4, "u2", "insert", at(2)),
        (5, "u3", "insert", at(0)),
        (6, "u3", "delete", at(1)),
        (7, "u4", "insert", at(1)),
        (8, "u4", "update", at(1)),
        (9, "u1", "revert", at(5)),  # bookkeeping: not a content change
    ]
    log = spark.createDataFrame(
        rows, "op_seq long, url string, op string, warc_ts timestamp_ntz"
    )
    got = {
        r.url: r
        for r in recrawl_schedule(log, "2024-03-01 06:00:00").collect()
    }
    assert set(got) == {"u1", "u2", "u4"}
    u1 = got["u1"]
    assert (u1.n_changes, u1.gap_s) == (3, 5400)
    assert u1.next_due == "2024-03-01 04:30:00"
    assert u1.overdue_score == 2.0
    u2 = got["u2"]
    assert u2.n_changes == 1
    assert u2.gap_s is None and u2.next_due is None and u2.overdue_score is None
    assert got["u4"].gap_s == 1  # zero span clamps, score defined


def test_asof_join_ignores_null_version_ts(spark):
    """A malformed version row with NULL warc_ts must not be served to
    probes that precede every real version (it used to sort nulls-first
    and win for them)."""
    from gnarly_spark.operators.temporal import asof_join

    versions = spark.createDataFrame(
        [("u", None, 9, "bad"), ("u", "2024-01-02 00:00:00", 1, "good")],
        "url string, warc_ts string, op_seq long, value string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    probes = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00"), ("u", "2024-01-03 00:00:00")],
        "url string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (str(r.ts), r.asof_value) for r in asof_join(probes, versions).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", None),      # before any real version
        ("2024-01-03 00:00:00", "good"),
    }


def test_resample_ffill_hand_computed(spark):
    """Hourly grid per key: fill carries the latest at-or-before value,
    LWW on equal-ts ties, NULL before the first observation within the
    first bucket, grid spans exactly [first bucket .. last bucket]."""
    from gnarly_spark.operators.temporal import resample_ffill

    obs = spark.createDataFrame(
        [
            # key a: first obs mid-bucket 10:30 -> grid starts 10:00 (NULL)
            ("a", _ts("2020-01-01T10:30:00"), 1, 10.0),
            # two obs at the SAME instant: higher seq wins (LWW)
            ("a", _ts("2020-01-01T12:00:00"), 2, 20.0),
            ("a", _ts("2020-01-01T12:00:00"), 3, 30.0),
            ("a", _ts("2020-01-01T14:45:00"), 4, 40.0),
            # key b: single observation exactly on the grid instant
            ("b", _ts("2020-01-01T00:00:00"), 5, 50.0),
        ],
        schema="k string, ts timestamp, seq long, v double",
    )
    got = {
        (r.k, r.grid_ts.isoformat()): (r.v, r.seq)
        for r in resample_ffill(
            obs, key="k", ts_col="ts", value_cols=["v", "seq"],
            step_s=3600, seq_col="seq",
        ).collect()
    }
    assert got == {
        ("a", "2020-01-01T10:00:00"): (None, None),  # before first obs
        ("a", "2020-01-01T11:00:00"): (10.0, 1),
        ("a", "2020-01-01T12:00:00"): (30.0, 3),  # at-instant + LWW tie
        ("a", "2020-01-01T13:00:00"): (30.0, 3),
        ("a", "2020-01-01T14:00:00"): (30.0, 3),  # 14:45 obs is later
        ("b", "2020-01-01T00:00:00"): (50.0, 5),
    }
