"""Merge-on-read lake mode: O(batch) delta commits, read-time LWW
resolution, bucket-granular compaction, exactly-once refires.

MOR is the write path a high-frequency CDC stream needs at 100 TB: a COW
merge rewrites every touched bucket (1-row change to a 6 GB bucket = 6 GB
of I/O), a MOR merge writes only the batch's own rows. The contract under
test: for any sequence of merges, a MOR table READS identically to a COW
table fed the same sequence — before and after compact() — and compaction
never rewrites buckets it wasn't asked to."""

from __future__ import annotations

import pytest

from gnarly_spark.sinks.lake import ParquetLakeTable


def _pdf(df):
    return df.toPandas().sort_values("url").reset_index(drop=True)


def mk(spark, rows, schema="url string, v int"):
    return spark.createDataFrame(rows, schema=schema)


@pytest.fixture()
def pair(spark, tmp_path):
    """Same merge feed applied to one COW and one MOR table."""
    cow = ParquetLakeTable(spark, str(tmp_path / "cow"), key="url", n_buckets=4)
    mor = ParquetLakeTable(
        spark, str(tmp_path / "mor"), key="url", n_buckets=4, mode="mor"
    )
    return cow, mor


def _feed(spark, t: ParquetLakeTable):
    t.merge(mk(spark, [(f"url{i}", i) for i in range(20)]), batch_id=0)
    t.merge(mk(spark, [("url3", 300), ("url21", 21)]), batch_id=1)
    t.merge(
        mk(spark, [("url5", 500)]),
        delete_keys=mk(spark, [("url7",), ("url19",)], "url string"),
        batch_id=2,
    )
    # same key upserted AND deleted in one batch: upsert wins (both modes)
    t.merge(
        mk(spark, [("url3", 301)]),
        delete_keys=mk(spark, [("url3",), ("url21",)], "url string"),
        batch_id=3,
    )


def test_mor_reads_equal_cow(spark, pair):
    cow, mor = pair
    _feed(spark, cow)
    _feed(spark, mor)
    c, m = _pdf(cow.read()), _pdf(mor.read())
    assert c.url.tolist() == m.url.tolist()
    assert c.v.tolist() == m.v.tolist()
    # and so does a point lookup through the bucket-pruned path
    assert _pdf(mor.lookup("url3")).v.tolist() == [301]
    assert _pdf(mor.lookup("url7")).empty


def test_mor_merge_is_o_batch(spark, pair):
    """A MOR merge never rewrites base files and writes only delta files
    for the batch's own buckets — the whole point of the mode."""
    _, mor = pair
    mor.merge(mk(spark, [(f"url{i}", i) for i in range(40)]), batch_id=0)
    m0 = mor._manifest()
    mor.merge(mk(spark, [("url0", 99)]), batch_id=1)
    m1 = mor._manifest()
    assert m1["buckets"] == m0["buckets"]  # base untouched, byte for byte
    grew = [b for b in m1["deltas"] if m1["deltas"][b] != m0["deltas"].get(b, [])]
    assert len(grew) == 1  # url0 lands in exactly one bucket's delta list


def test_compact_folds_deltas_and_preserves_state(spark, pair):
    cow, mor = pair
    _feed(spark, cow)
    _feed(spark, mor)
    before = _pdf(mor.read())
    stats = mor.compact()
    assert stats["compacted_buckets"] > 0 and stats["folded_delta_files"] > 0
    m = mor._manifest()
    assert all(not fl for fl in m["deltas"].values())
    after = _pdf(mor.read())
    assert before.equals(after)
    # compacted read is a plain scan of base files only (no delta files)
    assert all("/data/" in f for f in mor.read().inputFiles())
    # reads still match COW, and new deltas stack on the compacted base
    assert _pdf(mor.read()).equals(_pdf(cow.read()))
    mor.merge(mk(spark, [("url0", 1000)]), batch_id=9)
    assert _pdf(mor.lookup("url0")).v.tolist() == [1000]


def test_compact_subset_leaves_other_buckets_pending(spark, pair):
    _, mor = pair
    mor.merge(mk(spark, [(f"url{i}", i) for i in range(40)]), batch_id=0)
    mor.merge(mk(spark, [(f"url{i}", i * 10) for i in range(40)]), batch_id=1)
    pending = [int(b) for b, fl in mor._manifest()["deltas"].items() if fl]
    pick = pending[:1]
    stats = mor.compact(buckets=pick)
    assert stats["compacted_buckets"] == 1
    m = mor._manifest()
    assert not m["deltas"].get(str(pick[0]), [])
    still = [int(b) for b, fl in m["deltas"].items() if fl]
    assert set(still) == set(pending) - set(pick)
    assert sorted(_pdf(mor.read()).v.tolist()) == [i * 10 for i in range(40)]


def test_mor_refire_idempotent_and_time_travel(spark, pair):
    _, mor = pair
    mor.merge(mk(spark, [("a", 1)]), batch_id=0)
    v0 = mor.current_version()
    mor.merge(mk(spark, [("a", 2)]), batch_id=1)
    assert mor.merge(mk(spark, [("a", 999)]), batch_id=1) is False  # refire
    assert _pdf(mor.read()).v.tolist() == [2]
    assert _pdf(mor.read(version=v0)).v.tolist() == [1]  # pre-delta snapshot
    # compaction changes no row, so the diff change feed sees nothing
    mor.compact()
    assert mor.diff(mor.current_version() - 1).count() == 0


def test_mor_schema_evolution_mid_deltas(spark, pair):
    """A widened batch lands as a delta; older base AND older delta files
    null-fill the new column at read (no rewrite of anything)."""
    _, mor = pair
    mor.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    mor.merge(
        mk(spark, [("a", 10, "en")], "url string, v int, lang string"),
        batch_id=1,
    )
    got = _pdf(mor.read())
    assert got.columns.tolist() == ["url", "v", "lang"]
    assert got.v.tolist() == [10, 2]
    assert got.lang.tolist()[0] == "en" and got.lang.isna().tolist() == [False, True]
    # evolution survives compaction
    mor.compact()
    assert _pdf(mor.read()).lang.tolist()[0] == "en"


def test_mor_type_widening_mid_deltas(spark, pair):
    """An existing column arriving with a WIDER type (int -> bigint) widens
    the table schema on both modes: COW coerces + rewrites stale buckets,
    MOR records the widened type and upcasts old base files at scan time
    (Spark 4 parquet widening reads) — no crash, identical reads, and
    compaction folds to the widened type."""
    cow, mor = pair
    big = 1 << 40  # does not fit int32
    for t in (cow, mor):
        t.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
        t.merge(
            mk(spark, [("b", big), ("d", 4)], "url string, v bigint"),
            batch_id=1,
        )
    c, m = _pdf(cow.read()), _pdf(mor.read())
    assert c.v.tolist() == m.v.tolist() == [1, big, 3, 4]
    assert "v bigint" in cow._manifest()["schema"]
    assert "v bigint" in mor._manifest()["schema"]
    # bucket-pruned lookup reads base (int32) and delta (int64) files in
    # one scan under the widened schema
    assert _pdf(mor.lookup("a")).v.tolist() == [1]
    assert _pdf(mor.lookup("b")).v.tolist() == [big]
    mor.compact()
    assert _pdf(mor.read()).v.tolist() == [1, big, 3, 4]


def test_n_buckets_sticky_on_reopen(spark, tmp_path):
    """n_buckets is a physical-layout fact recorded in the manifest: a job
    reopening the table with a different value must get the recorded one,
    or lookups would scan the wrong bucket and compact() would write rows
    into buckets the new manifest never references."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=4)
    t.merge(mk(spark, [(f"url{i}", i) for i in range(30)]), batch_id=0)
    re = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=32)
    assert re.n_buckets == 4
    assert _pdf(re.lookup("url7")).v.tolist() == [7]
    re.merge(mk(spark, [("url7", 700)]), batch_id=1)
    assert _pdf(re.lookup("url7")).v.tolist() == [700]
    assert _pdf(re.read()).shape[0] == 30


def test_mor_mode_sticky_on_reopen(spark, tmp_path):
    """The manifest's recorded mode wins over the constructor argument —
    a maintenance job reopening with defaults must not flip the table to
    COW semantics."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", mode="mor")
    t.merge(mk(spark, [("a", 1)]), batch_id=0)
    reopened = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    assert reopened.mode == "mor"
    reopened.merge(mk(spark, [("a", 2)]), batch_id=1)
    assert reopened._manifest()["buckets"] == t._manifest(0)["buckets"]


def test_expire_keeps_live_delta_files(spark, pair):
    """Delta files referenced by kept manifests are never orphan-deleted;
    after compaction ages them out of every kept manifest they are."""
    _, mor = pair
    mor.merge(mk(spark, [("a", 1)]), batch_id=0)
    mor.merge(mk(spark, [("a", 2)]), batch_id=1)
    stats = mor.expire_snapshots(keep_last=1)
    assert stats["deleted_files"] == 0  # current manifest references both
    assert _pdf(mor.read()).v.tolist() == [2]
    mor.compact()
    stats = mor.expire_snapshots(keep_last=1)
    assert stats["deleted_files"] > 0  # folded deltas now unreferenced
    assert _pdf(mor.read()).v.tolist() == [2]


def test_compact_hot_policy_targets_backlogged_buckets(spark, tmp_path):
    """compact_hot folds only buckets whose delta backlog exceeds the
    threshold: the hot key's bucket is compacted (deltas emptied), the
    cool bucket keeps its cheap deltas, and the table state is unchanged."""
    from pyspark.sql import functions as F

    from gnarly_spark.sinks.lake import ParquetLakeTable, bucket_of

    t = ParquetLakeTable(spark, str(tmp_path / "m"), key="url", n_buckets=4, mode="mor")

    def mk(rows):
        return spark.createDataFrame(rows, "url string, v int")

    hot_url, cool_url = "hot", "cool"
    hb = spark.range(1).select(bucket_of(F.lit(hot_url), 4)).collect()[0][0]
    cb = spark.range(1).select(bucket_of(F.lit(cool_url), 4)).collect()[0][0]
    assert hb != cb, "pick urls hashing to different buckets for this test"
    # 5 merges touch the hot url; 1 touches the cool one
    for i in range(5):
        t.merge(mk([(hot_url, i)]), batch_id=i)
    t.merge(mk([(cool_url, 99)]), batch_id=9)
    dmap = t._manifest(t.current_version())["deltas"]
    assert len(dmap.get(str(hb), [])) == 5 and len(dmap.get(str(cb), [])) == 1
    stats = t.compact_hot(max_deltas=2)
    assert stats["hot_buckets"] == [hb]
    assert stats["compacted_buckets"] >= 1
    dmap2 = t._manifest(t.current_version())["deltas"]
    assert dmap2.get(str(hb), []) == [] and len(dmap2.get(str(cb), [])) == 1
    got = {r.url: r.v for r in t.read().collect()}
    assert got == {hot_url: 4, cool_url: 99}
    # below-threshold backlog: no-op, no commit
    v = t.current_version()
    assert t.compact_hot(max_deltas=8)["hot_buckets"] == []
    assert t.current_version() == v
