"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in gnarly_spark/catalog.py (core CDC + relational
operators, keyed to SURVEY.md §2 IDs) and gnarly_spark/catalog_training.py
(dedup / similarity / text-analysis training-data operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gnarly_spark.catalog as _catalog  # noqa: E402
import gnarly_spark.catalog_graph as _graph  # noqa: E402  (registers more)
import gnarly_spark.catalog_training as _training  # noqa: E402  (registers more)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full CDC changelog replay
    (revert exclusion + per-url last-writer-wins + delete handling) using
    the engine's own operators."""
    return _catalog.QUERIES["cdc_replay_lww"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    ops). Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return dict(_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the genuinely
    non-SQL-expressible ones -> driver records a rows-only check)."""
    return dict(_catalog.ORACLES)
