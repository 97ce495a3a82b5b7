"""Lake->lake replication over the streaming change feed
(streaming/replicate.py): mirror == source after drain, batch collapse
across commits, incremental resume, refire no-op."""

from __future__ import annotations

import os

from gnarly_spark.sinks.lake import ParquetLakeTable
from gnarly_spark.streaming.replicate import replicate_feed


def _mor(spark, path):
    return ParquetLakeTable(spark, path, key="url", n_buckets=2, mode="mor")


def _rows(spark, rows):
    return spark.createDataFrame(rows, schema="url string, value double")


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], schema="url string")


def _state(t):
    return {(r.url, r.value) for r in t.read().select("url", "value").collect()}


def test_replication_converges_and_collapses_multi_commit_batches(spark, tmp_path):
    tmp = str(tmp_path)
    src = _mor(spark, os.path.join(tmp, "src"))
    # a: upsert -> delete -> re-upsert; b: upsert -> update; c: upsert -> delete
    src.merge(_rows(spark, [("a", 1.0), ("b", 1.0), ("c", 1.0)]), batch_id=0)
    src.merge(_rows(spark, [("b", 2.0)]), _keys(spark, ["a"]), batch_id=1)
    src.merge(_rows(spark, [("a", 3.0)]), _keys(spark, ["c"]), batch_id=2)

    mirror = ParquetLakeTable(spark, os.path.join(tmp, "dst"), key="url", n_buckets=4)
    q = replicate_feed(spark, src.path, mirror, os.path.join(tmp, "ck"))
    q.awaitTermination(180)

    assert _state(mirror) == _state(src) == {("a", 3.0), ("b", 2.0)}
    # availableNow packed all 3 source commits into one drain: the mirror
    # applied collapsed winners, not one merge per source commit
    assert mirror.current_version() == 0


def test_replication_resumes_incrementally_and_refires_are_noops(spark, tmp_path):
    tmp = str(tmp_path)
    src = _mor(spark, os.path.join(tmp, "src"))
    src.merge(_rows(spark, [("a", 1.0)]), batch_id=0)
    mirror = ParquetLakeTable(spark, os.path.join(tmp, "dst"), key="url", n_buckets=4)
    ck = os.path.join(tmp, "ck")

    replicate_feed(spark, src.path, mirror, ck).awaitTermination(180)
    assert _state(mirror) == {("a", 1.0)}
    v_after_first = mirror.current_version()

    # no new source commits: a re-run must change nothing
    replicate_feed(spark, src.path, mirror, ck).awaitTermination(180)
    assert mirror.current_version() == v_after_first

    # new commits arrive; the same checkpoint picks up ONLY those
    src.merge(_rows(spark, [("b", 2.0)]), _keys(spark, ["a"]), batch_id=1)
    replicate_feed(spark, src.path, mirror, ck).awaitTermination(180)
    assert _state(mirror) == _state(src) == {("b", 2.0)}
    assert mirror.current_version() == v_after_first + 1
