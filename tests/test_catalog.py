"""Driver-contract smoke: entry() runs, every query returns a DataFrame at
sf0.001, oracle keys are a subset of query keys, and Spark/SQL column names
line up (the driver hash-compares by sorted column name)."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


def test_entry_runs(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "last_ts", "last_seq", "last_value"]


def test_oracles_subset_of_queries(entrymod):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_all_queries_execute(spark, entrymod):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(1).collect()  # force execution of the plan head
