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


def test_drain_feed_capped_resume_and_zero_row_commits(spark, tmp_path):
    """Two regressions in one scenario: (1) the maxVersionsPerTrigger cap
    must hold on RESUMED runs (the reader suspends it when it can't learn
    the checkpoint offset — drain_feed now seeds it from the offset log),
    and (2) a capped run that covers only zero-row maintenance commits
    must NOT terminate the drain (old predicate: numInputRows == 0)."""
    from gnarly_spark.streaming.replicate import drain_feed

    tmp = str(tmp_path)
    src = _mor(spark, os.path.join(tmp, "src"))
    src.merge(_rows(spark, [("a", 1.0)]), batch_id=0)            # v0 data
    src.compact()                                                 # v1 zero-row
    src.merge(_rows(spark, [("b", 2.0)]), batch_id=1)            # v2 data
    src.compact()                                                 # v3 zero-row
    src.merge(_rows(spark, [("c", 3.0)]), batch_id=2)            # v4 data

    mirror = ParquetLakeTable(spark, os.path.join(tmp, "dst"), key="url", n_buckets=4)
    out = drain_feed(
        spark,
        src.path,
        mirror,
        os.path.join(tmp, "ck"),
        max_versions_per_trigger=1,
    )
    # every committed data row made it despite zero-row commits in between
    assert _state(mirror) == _state(src) == {("a", 1.0), ("b", 2.0), ("c", 3.0)}
    # cap=1 over 5 source versions: the drain needed one run per version
    # (the resumed cap held — an uncapped resume would finish in ~2 runs)
    assert out["runs"] >= 5, out
