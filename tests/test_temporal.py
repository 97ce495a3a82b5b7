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
