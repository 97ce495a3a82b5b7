"""Lake change feed as a streaming source (sources/lakefeed.py).

Covers: incremental delta tailing across merges, compaction emitting
nothing, checkpoint resume picking up only new commits, restore-commit
guard (fail by default, skippable), COW rejection, pre-evolution null
fill, and maxVersionsPerTrigger pacing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable
from gnarly_spark.sources.lakefeed import LakeFeedDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(LakeFeedDataSource)
    return spark


def _mor(spark, tmp, **kw) -> ParquetLakeTable:
    return ParquetLakeTable(
        spark, os.path.join(tmp, "t"), key="url", n_buckets=2, mode="mor", **kw
    )


def _rows(spark, rows):
    return spark.createDataFrame(rows, schema="url string, value double")


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], schema="url string")


def _drain(spark, table_path, ckpt, out_dir, **opts):
    """availableNow drain to a parquet sink (supports checkpoint resume);
    returns the accumulated rows as a DataFrame."""
    reader = spark.readStream.format("lakefeed").option("path", table_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(out_dir)
    except Exception:  # no file ever written (empty drain on fresh sink)
        return spark.createDataFrame([], schema="url string")


def test_feed_tails_merges_and_skips_compaction(registered, tmp_path):
    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    t.merge(_rows(spark, [("a", 1.0), ("b", 2.0)]), batch_id=0)  # v0
    t.merge(_rows(spark, [("a", 3.0)]), _keys(spark, ["b"]), batch_id=1)  # v1
    t.compact()  # v2 — a rewrite, not a change
    t.merge(_rows(spark, [("c", 4.0)]), batch_id=2)  # v3

    got = _drain(
        spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
        startingVersion=0,
    )
    rows = {(r.url, r._op, r._delta_seq, r.value) for r in got.collect()}
    assert rows == {
        ("a", "upsert", 0, 1.0),
        ("b", "upsert", 0, 2.0),
        ("a", "upsert", 1, 3.0),
        ("b", "delete", 1, None),
        ("c", "upsert", 3, 4.0),
    }
    # the feed replays exactly what merges appended: folding it per key
    # (last _delta_seq wins, delete drops) reproduces the table
    w = got.groupBy("url").agg(F.max_by(F.struct("_op", "value"), "_delta_seq").alias("s"))
    final = {
        (r.url, r.s.value) for r in w.collect() if r.s._op != "delete"
    }
    assert final == {(r.url, r.value) for r in t.read().select("url", "value").collect()}


def test_feed_resumes_from_checkpoint_reading_only_new_commits(registered, tmp_path):
    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=0)
    ck, out = os.path.join(tmp, "ck"), os.path.join(tmp, "out")
    first = _drain(spark, t.path, ck, out, startingVersion=0)
    assert first.count() == 1

    t.merge(_rows(spark, [("b", 2.0)]), batch_id=1)
    second = _drain(spark, t.path, ck, out, startingVersion=0)  # same checkpoint
    rows = {(r.url, r._delta_seq) for r in second.collect()}
    assert rows == {("a", 0), ("b", 1)}  # b appended ONCE — no re-read of v0


def test_feed_tail_default_starts_at_current_version(registered, tmp_path):
    import time

    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=0)
    ck, out = os.path.join(tmp, "ck"), os.path.join(tmp, "out")
    q = (
        spark.readStream.format("lakefeed").option("path", t.path).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        # wait for the first trigger to complete so the source's tail
        # position (current published version) is locked in before the
        # next commit lands — otherwise the merge races reader init
        deadline = time.time() + 90
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.2)
        assert q.lastProgress is not None, "stream never triggered"
        t.merge(_rows(spark, [("b", 2.0)]), batch_id=1)  # arrives mid-stream
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                rows = []
            if rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # only the commit made AFTER stream start — v0 is never replayed
    assert {(r.url, r._delta_seq) for r in rows} == {("b", 1)}


def test_feed_fails_on_restore_unless_skipped(registered, tmp_path):
    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=0)
    t.merge(_rows(spark, [("a", 2.0)]), batch_id=1)
    t.restore(0)  # v2: logical change with no delta files
    t.merge(_rows(spark, [("b", 3.0)]), batch_id=2)  # v3

    with pytest.raises(Exception, match="restore"):
        _drain(
            spark, t.path, os.path.join(tmp, "ck1"), os.path.join(tmp, "o1"),
            startingVersion=0,
        )
    got = _drain(
        spark, t.path, os.path.join(tmp, "ck2"), os.path.join(tmp, "o2"),
        startingVersion=0, skipRestoreCommits="true",
    )
    rows = sorted((r.url, r._delta_seq) for r in got.collect())
    # multiset: a skipped restore emits NOTHING (diffing the restore
    # manifest against its COPIED parent pointer used to re-emit the
    # restore target's whole backlog as duplicates)
    assert rows == [("a", 0), ("a", 1), ("b", 3)]


def test_feed_rejects_cow_tables(registered, tmp_path):
    spark, tmp = registered, str(tmp_path)
    t = ParquetLakeTable(spark, os.path.join(tmp, "t"), key="url", n_buckets=2)
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=0)
    with pytest.raises(Exception, match="copy-on-write"):
        _drain(spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
               startingVersion=0)


def test_feed_null_fills_pre_evolution_delta_files(registered, tmp_path):
    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=0)  # no 'extra' column yet
    t.merge(
        spark.createDataFrame(
            [("b", 2.0, "x")], schema="url string, value double, extra string"
        ),
        batch_id=1,
    )
    got = _drain(
        spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
        startingVersion=0,
    )
    rows = {(r.url, r.value, r.extra) for r in got.collect()}
    assert rows == {("a", 1.0, None), ("b", 2.0, "x")}


def test_feed_roundtrips_webpage_shape_binary_and_timestamp(registered, tmp_path):
    """The north-rule table shape (url, warc_ts timestamp_ntz, html binary,
    text, lang) through the pyarrow read path: bytes and timestamps must
    round-trip exactly."""
    import datetime

    spark, tmp = registered, str(tmp_path)
    t = ParquetLakeTable(
        spark, os.path.join(tmp, "t"), key="url", n_buckets=2, mode="mor"
    )
    ts = datetime.datetime(2026, 3, 1, 12, 30, 45, 123456)
    page = spark.createDataFrame(
        [("https://a", ts, b"<html>\x00\xffbytes</html>", "body text", "en")],
        schema="url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    t.merge(page, batch_id=0)
    got = _drain(
        spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
        startingVersion=0,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.url, r.warc_ts, bytes(r.html), r.text, r.lang, r._op) == (
        "https://a", ts, b"<html>\x00\xffbytes</html>", "body text", "en", "upsert"
    )


def test_feed_max_versions_per_trigger_paces_offsets(registered, tmp_path):
    from gnarly_spark.sources.lakefeed import LakeFeedStreamReader

    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    for i in range(4):
        t.merge(_rows(spark, [(f"u{i}", float(i))]), batch_id=i)

    fields = [("url", "string"), ("value", "double"),
              ("_op", "string"), ("_delta_seq", "bigint")]
    r = LakeFeedStreamReader(
        {"path": t.path, "startingVersion": "0", "maxVersionsPerTrigger": "2"},
        fields,
    )
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 1}  # capped: -1 + 2
    assert len(r.partitions({"version": -1}, {"version": 1})) == 2
    r.commit({"version": 1})
    assert r.latestOffset() == {"version": 3}  # next window

    # resumed reader (initialOffset bypassed): cap suspends until the
    # consumed position is learned — never wedged below the checkpoint
    r2 = LakeFeedStreamReader(
        {"path": t.path, "startingVersion": "0", "maxVersionsPerTrigger": "1"},
        fields,
    )
    assert r2.latestOffset() == {"version": 3}  # uncapped first call
    r2.partitions({"version": 2}, {"version": 3})  # learns consumed=2
    assert r2.latestOffset() == {"version": 3}  # 2 + 1

    # end-to-end with the cap: everything still drains
    got = _drain(
        spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
        startingVersion=0, maxVersionsPerTrigger=1,
    )
    assert got.count() == 4


def test_feed_offsets_never_regress_below_advertised_end(registered, tmp_path):
    """Falsy version values (-1 tail sentinel, version 0) must not corrupt
    consumed-tracking, and latestOffset must be MONOTONIC: Spark treats a
    smaller offset as new data and re-plans delivered ranges — duplicate
    rows in every append sink."""
    from gnarly_spark.sources.lakefeed import LakeFeedStreamReader

    spark, tmp = registered, str(tmp_path)
    t = _mor(spark, tmp)
    for i in range(3):
        t.merge(_rows(spark, [(f"u{i}", float(i))]), batch_id=i)
    fields = [("url", "string"), ("value", "double"),
              ("_op", "string"), ("_delta_seq", "bigint")]
    r = LakeFeedStreamReader(
        {"path": t.path, "startingVersion": "0", "maxVersionsPerTrigger": "1"},
        fields,
    )
    # cold serving reader: Spark may ask latestOffset BEFORE initialOffset
    assert r.latestOffset() == {"version": 2}  # uncapped first call
    r.partitions({"version": -1}, {"version": 2})  # start=-1 is falsy
    assert r.latestOffset() == {"version": 2}  # was 0: regression re-plan
    r.commit({"version": 2})
    assert r.latestOffset() == {"version": 2}
    t.merge(_rows(spark, [("u9", 9.0)]), batch_id=3)
    assert r.latestOffset() == {"version": 3}

    # end-to-end: capped drain delivers each row EXACTLY once (multiset,
    # not set — duplicates were invisible to a set compare)
    got = _drain(
        spark, t.path, os.path.join(tmp, "ck"), os.path.join(tmp, "out"),
        startingVersion=0, maxVersionsPerTrigger=1,
    )
    rows = [(r.url, r._delta_seq) for r in got.collect()]
    assert sorted(rows) == [("u0", 0), ("u1", 1), ("u2", 2), ("u9", 3)]


def test_feed_ignores_branch_commits_until_fast_forward(
    registered, tmp_path
):
    """Branch commits share the version-number space but must be INVISIBLE
    to the main change feed until published; fast_forward then delivers
    the branch chain's delta files in one batch (diffed against the last
    MAIN manifest, not the commit's branch-head parent)."""
    spark = registered
    t = _mor(spark, str(tmp_path))
    t.merge(_rows(spark, [("a", 1.0)]), batch_id=1)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, t.path, ck, out, startingVersion="0")
    assert {r.url for r in got.collect()} == {"a"}

    b = t.create_branch("wip")
    b.merge(_rows(spark, [("x", 9.0)]), batch_id=2)
    b.merge(_rows(spark, [("y", 9.0)]), batch_id=3)
    # main also moves (so the feed HAS new published versions to scan past
    # the interleaved branch commits)
    t.merge(_rows(spark, [("m", 2.0)]), batch_id=4)
    got = _drain(spark, t.path, ck, out)
    urls = [r.url for r in got.collect()]
    assert urls.count("m") == 1
    assert "x" not in urls and "y" not in urls, "branch rows leaked"

    # fast_forward would refuse (diverged) — publish via merge_branch,
    # which lands the branch rows as a NEW main merge commit
    t.merge_branch("wip", batch_id=5)
    got = _drain(spark, t.path, ck, out)
    urls = [r.url for r in got.collect()]
    assert urls.count("x") == 1 and urls.count("y") == 1

    # and the pure fast_forward path: fresh branch, main frozen
    b2 = t.create_branch("ff")
    b2.merge(_rows(spark, [("z", 5.0)]), batch_id=6)
    b2.merge(_rows(spark, [("w", 5.0)]), batch_id=7)
    t.fast_forward("ff")
    got = _drain(spark, t.path, ck, out)
    urls = [r.url for r in got.collect()]
    assert urls.count("z") == 1 and urls.count("w") == 1, (
        "fast_forward must deliver the whole branch delta chain exactly once"
    )


def test_feed_tails_a_branch_ref(registered, tmp_path):
    """branch=<name> tails the BRANCH's history: pre-fork main commits
    plus the branch's own commits, while main's post-fork commits stay
    invisible — the preview consumer of an unpublished WAP chain."""
    spark = registered
    t = _mor(spark, str(tmp_path))
    t.merge(_rows(spark, [("pre", 1.0)]), batch_id=1)
    b = t.create_branch("wip")
    b.merge(_rows(spark, [("b1", 2.0)]), batch_id=2)
    t.merge(_rows(spark, [("post", 3.0)]), batch_id=3)  # main diverges
    b.merge(_rows(spark, [("b2", 4.0)]), batch_id=4)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, t.path, ck, out, startingVersion="0", branch="wip")
    urls = sorted(r.url for r in got.collect())
    assert urls == ["b1", "b2", "pre"], urls

    # incremental: only NEW branch commits on the next drain
    b.merge(_rows(spark, [("b3", 5.0)]), batch_id=5)
    t.merge(_rows(spark, [("post2", 6.0)]), batch_id=6)
    got = _drain(spark, t.path, ck, out, startingVersion="0", branch="wip")
    urls = sorted(r.url for r in got.collect())
    assert urls == ["b1", "b2", "b3", "pre"], urls
