"""Positional deletion vectors (delete_where): predicate deletes as
(file, row_index) DV files — Iceberg v2 positional deletes re-expressed
Spark-first. Covers COW pushdown path, the MOR all-physical-copies rule
(no base-image resurrection), time travel, diff/changelog visibility,
stacking, compaction materialize+prune, expire liveness, the purge guard,
lookup/scan integration, export remap, and the lakefeed non-append
contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable


def _pdf(df):
    return df.toPandas().sort_values("url").reset_index(drop=True)


def mk(spark, rows, schema="url string, v int"):
    return spark.createDataFrame(rows, schema=schema)


@pytest.fixture()
def cow(spark, tmp_path):
    return ParquetLakeTable(spark, str(tmp_path / "cow"), key="url", n_buckets=4)


@pytest.fixture()
def mor(spark, tmp_path):
    return ParquetLakeTable(
        spark, str(tmp_path / "mor"), key="url", n_buckets=4, mode="mor"
    )


def test_cow_predicate_delete_and_time_travel(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 5), ("c", 9), ("d", 5)]), batch_id=0)
    v0 = cow.current_version()
    out = cow.delete_where("v = 5")
    assert out["rows_deleted"] == 2 and out["positions"] == 2
    assert _pdf(cow.read()).url.tolist() == ["a", "c"]
    # no data file was rewritten: the commit's bucket lists are unchanged
    m0, m1 = cow._manifest(v0), cow._manifest()
    assert m1["buckets"] == m0["buckets"] and m1["dvs"]
    # time travel: the pre-delete snapshot still shows every row
    assert _pdf(cow.read(version=v0)).url.tolist() == ["a", "b", "c", "d"]
    # the change feed reports exactly the DV'd rows as deletes
    d = cow.diff(v0).toPandas()
    assert sorted(d[d["_change"] == "delete"]["url"]) == ["b", "d"]
    imgs = cow.changelog(v0).toPandas()
    assert sorted(imgs[imgs["_change_type"] == "delete"]["v"]) == [5, 5]


def test_delete_where_noop_does_not_commit(spark, cow):
    cow.merge(mk(spark, [("a", 1)]), batch_id=0)
    v = cow.current_version()
    out = cow.delete_where("v = 999")
    assert out["rows_deleted"] == 0
    assert cow.current_version() == v  # no empty commit


def test_dvs_stack_and_survive_merges(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    cow.delete_where("v = 1")
    cow.delete_where("v = 3")
    assert _pdf(cow.read()).url.tolist() == ["b"]
    # a later merge must not lose the DVs (untouched buckets keep files)
    cow.merge(mk(spark, [("e", 7)]), batch_id=1)
    assert _pdf(cow.read()).url.tolist() == ["b", "e"]
    # deleted key re-inserted by a NEW merge becomes visible again (the
    # DV pins old positions, not the key)
    cow.merge(mk(spark, [("a", 100)]), batch_id=2)
    got = _pdf(cow.read())
    assert got.url.tolist() == ["a", "b", "e"]
    assert got[got.url == "a"].v.tolist() == [100]


def test_mor_no_base_image_resurrection(spark, mor):
    """THE DV correctness trap: key updated in a delta, then predicate-
    deleted — DV'ing only the delta copy would resurrect the stale base
    image at resolve time. Every physical copy must be DV'd."""
    mor.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    mor.merge(mk(spark, [("a", 50)]), batch_id=1)  # delta upsert, base a=1 stale
    out = mor.delete_where("v >= 50")
    # 1 visible row deleted, but BOTH physical copies of 'a' are DV'd
    assert out["rows_deleted"] == 1 and out["positions"] == 2
    assert _pdf(mor.read()).url.tolist() == ["b"]  # a=1 must NOT resurface


def test_mor_tombstones_keep_suppressing(spark, mor):
    mor.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    mor.merge(None, delete_keys=mk(spark, [("a",)], "url string"), batch_id=1)
    out = mor.delete_where("v = 2")
    assert _pdf(mor.read()).url.tolist() == []
    # the tombstone row was NOT DV'd (only b's copy was): 'a' stays deleted
    assert out["positions"] == 1


def test_compact_materializes_and_prunes_dvs(spark, mor):
    mor.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    mor.delete_where("v = 2")
    stats = mor.compact()
    assert stats["pruned_dv_files"] >= 1
    assert not mor._manifest().get("dvs")  # fully materialized
    assert _pdf(mor.read()).url.tolist() == ["a", "c"]


def test_compact_on_cow_materializes_dv_only_buckets(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    cow.delete_where("v = 1")
    stats = cow.compact()  # no deltas at all — selection is DV-driven
    assert stats["compacted_buckets"] >= 1
    assert not cow._manifest().get("dvs")
    assert _pdf(cow.read()).url.tolist() == ["b"]


def test_expire_keeps_then_reclaims_dv_files(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    cow.delete_where("v = 1")
    dv_files = list(cow._manifest()["dvs"])
    cow.merge(mk(spark, [("c", 3)]), batch_id=1)
    cow.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for f in dv_files)  # still referenced
    assert _pdf(cow.read()).url.tolist() == ["b", "c"]
    cow.compact()
    cow.merge(mk(spark, [("d", 4)]), batch_id=2)
    cow.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(f) for f in dv_files)  # aged out
    assert _pdf(cow.read()).url.tolist() == ["b", "c", "d"]


def test_purge_refuses_with_retained_dvs(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    cow.delete_where("v = 1")
    with pytest.raises(ValueError, match="deletion vectors"):
        cow.purge_keys("b")
    # maintenance path clears the guard
    cow.compact()
    cow.expire_snapshots(keep_last=1)
    out = cow.purge_keys("b")
    assert out["rows_purged"] == 1
    assert _pdf(cow.read()).url.tolist() == []


def test_lookup_and_scan_respect_dvs(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    cow.delete_where("url = 'b'")
    assert cow.lookup("b").count() == 0
    assert cow.lookup("a", "c").count() == 2
    assert _pdf(cow.scan_range("v", 1, 3)).url.tolist() == ["a", "c"]


def test_export_snapshot_remaps_dvs(spark, cow, tmp_path):
    cow.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    cow.delete_where("v = 2")
    dest = str(tmp_path / "clone")
    cow.export_snapshot(dest)
    clone = ParquetLakeTable(spark, dest, key="url")
    assert _pdf(clone.read()).url.tolist() == ["a", "c"]


def test_restore_to_pre_dv_snapshot(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    v0 = cow.current_version()
    cow.delete_where("v = 2")
    assert _pdf(cow.read()).url.tolist() == ["a"]
    cow.restore(v0)
    assert _pdf(cow.read()).url.tolist() == ["a", "b"]


def test_lakefeed_fails_loud_on_dv_commit(spark, mor, tmp_path):
    from gnarly_spark.sources.lakefeed import LakeFeedDataSource

    spark.dataSource.register(LakeFeedDataSource)
    mor.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    mor.delete_where("v = 1")
    mor.merge(mk(spark, [("c", 3)]), batch_id=1)

    def drain(ck, out, **opts):
        reader = (
            spark.readStream.format("lakefeed")
            .option("path", mor.path)
            .option("startingVersion", "0")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(str(tmp_path / out))

    with pytest.raises(Exception, match="deletion vectors"):
        drain("ck1", "o1")
    # skip option: feed drains, deletes are NOT represented (documented)
    got = drain("ck2", "o2", skipDeleteVectorCommits="true")
    assert got.where(F.col("url") == "c").count() == 1


def test_maintenance_job_delete_where_flag(spark, tmp_path, capsys):
    """CLI path: --delete-where deletes by DV, and with --compact in the
    same invocation the DVs are materialized and pruned before expiry."""
    import json as _json

    from jobs.maintenance_job import main

    t = ParquetLakeTable(
        spark, str(tmp_path / "p"), key="url", n_buckets=2, mode="mor"
    )
    t.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    main(
        [
            "--table", str(tmp_path / "p"),
            "--delete-where", "v >= 2",
            "--compact",
            "--keep-last", "10",
        ]
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["delete_where"]["rows_deleted"] == 2
    assert out["compact"]["pruned_dv_files"] >= 1
    t2 = ParquetLakeTable(spark, str(tmp_path / "p"), key="url")
    assert _pdf(t2.read()).url.tolist() == ["a"]
    assert not t2._manifest().get("dvs")


def test_cluster_materializes_dvs(spark, cow):
    """cluster() (z-order) resolves the DV-filtered view and rewrites
    everything — the new snapshot must carry no DVs and no deleted rows."""
    cow.merge(
        mk(spark, [(f"u{i}", i) for i in range(20)]), batch_id=0
    )
    cow.delete_where("v % 5 = 0")
    out = cow.cluster(by=["v"])
    assert out["files"] >= 1
    assert not cow._manifest().get("dvs")
    got = sorted(r.v for r in cow.read().collect())
    assert got == [i for i in range(20) if i % 5 != 0]


def test_schema_evolution_on_dv_table(spark, cow):
    """A widening merge (new column) on a table carrying DVs: the DVs
    keep filtering old files while new files carry the new column."""
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    cow.delete_where("v = 1")
    cow.merge(
        mk(spark, [("c", 3, "fresh")], "url string, v int, note string"),
        batch_id=1,
    )
    got = _pdf(cow.read())
    assert got.url.tolist() == ["b", "c"]
    assert got.note.tolist() == [None, "fresh"]


def test_iceberg_delete_sql_contract():
    """Jar-free contract for the production path: IcebergLakeTable
    delete_where emits a row-level DELETE — Iceberg v2 executes it as
    positional delete files (its native deletion vectors), mirroring the
    parquet table's delete_where representation."""
    from gnarly_spark.sinks.lake import build_delete_sql

    sql = build_delete_sql("lake.db.pages", "lang = 'xx' AND length(text) < 10")
    assert sql == "DELETE FROM lake.db.pages WHERE lang = 'xx' AND length(text) < 10"


def test_update_where_basic_and_old_row_semantics(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    out = cow.update_where("v >= 2", {"v": "v * 10"})
    assert out["rows_updated"] == 2
    got = _pdf(cow.read())
    assert got.v.tolist() == [1, 20, 30]
    # swap semantics: every assignment sees the OLD row (one projection)
    t2 = ParquetLakeTable(spark, cow.path + "_swap", key="url")
    t2.merge(
        spark.createDataFrame([("k", 1, 2)], "url string, x int, y int"),
        batch_id=0,
    )
    t2.update_where("url = 'k'", {"x": "y", "y": "x"})
    r = t2.read().collect()[0]
    assert (r.x, r.y) == (2, 1)


def test_update_where_guards_and_noop(spark, cow):
    cow.merge(mk(spark, [("a", 1)]), batch_id=0)
    v = cow.current_version()
    with pytest.raises(ValueError, match="merge key"):
        cow.update_where("v = 1", {"url": "'z'"})
    with pytest.raises(ValueError, match="unknown column"):
        cow.update_where("v = 1", {"nope": "1"})
    out = cow.update_where("v = 999", {"v": "0"})
    assert out["rows_updated"] == 0 and cow.current_version() == v
    # refire idempotence via batch_id
    cow.update_where("v = 1", {"v": "5"}, batch_id=77)
    v2 = cow.current_version()
    refired = cow.update_where("v = 5", {"v": "6"}, batch_id=77)  # no-op merge
    assert cow.current_version() == v2
    assert refired["rows_updated"] == 0  # never report a commit that didn't happen
    assert _pdf(cow.read()).v.tolist() == [5]


def test_update_where_mor_and_interop_with_dvs(spark, mor):
    mor.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    mor.delete_where("v = 2")
    out = mor.update_where("v >= 1", {"v": "v + 100"})
    assert out["rows_updated"] == 2  # the DV'd row is not visible to update
    got = _pdf(mor.read())
    assert got.url.tolist() == ["a", "c"] and got.v.tolist() == [101, 103]


def test_iceberg_update_sql_contract():
    from gnarly_spark.sinks.lake import build_update_sql

    sql = build_update_sql(
        "lake.db.pages", "lang = 'xx'", {"lang": "'und'", "text": "trim(text)"}
    )
    assert sql == (
        "UPDATE lake.db.pages SET lang = 'und', text = trim(text) "
        "WHERE lang = 'xx'"
    )


def test_maintenance_job_update_where_flag(spark, tmp_path, capsys):
    import json as _json

    from jobs.maintenance_job import main

    t = ParquetLakeTable(spark, str(tmp_path / "p"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1), ("b", 60)]), batch_id=0)
    main(
        [
            "--table", str(tmp_path / "p"),
            "--update-where", "v < 50", "v=v+100",
            "--keep-last", "10",
        ]
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["update_where"]["rows_updated"] == 1
    t2 = ParquetLakeTable(spark, str(tmp_path / "p"), key="url")
    assert _pdf(t2.read()).v.tolist() == [101, 60]


def test_data_files_reports_dv_kind(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    cow.delete_where("v = 1")
    df = cow.data_files().toPandas()
    dv_rows = df[df.kind == "dv"]
    assert len(dv_rows) >= 1
    assert (dv_rows.bucket == -1).all() and dv_rows.bytes.notna().all()


def test_compact_prunes_inert_dvs_without_pending_buckets(spark, cow):
    """COW: a merge rewrites the DV'd bucket, making the DV inert; a
    later compact() with NOTHING pending must still prune it (else reads
    pay the anti-join forever and purge_keys can never clear)."""
    cow.merge(mk(spark, [(f"u{i}", i) for i in range(12)]), batch_id=0)
    cow.delete_where("v = 3")
    # rewrite EVERY bucket so all DV refs go inert (upsert all keys)
    cow.merge(mk(spark, [(f"u{i}", i + 100) for i in range(12)]), batch_id=1)
    assert cow._manifest().get("dvs")  # carried forward, now inert
    stats = cow.compact()
    assert stats["compacted_buckets"] == 0  # control-plane only
    assert stats["pruned_dv_files"] >= 1
    assert not cow._manifest().get("dvs")
    # and the purge guard clears after expiry of the DV-carrying history
    cow.expire_snapshots(keep_last=1)
    assert cow.purge_keys("u5")["rows_purged"] == 1


def test_delete_where_batch_id_refire_is_noop(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    out = cow.delete_where("v = 1", batch_id=9)
    assert out["rows_deleted"] == 1
    v = cow.current_version()
    refired = cow.delete_where("v = 2", batch_id=9)  # must NOT re-evaluate
    assert refired["rows_deleted"] == 0 and cow.current_version() == v
    assert _pdf(cow.read()).url.tolist() == ["b"]


def test_purge_refuses_with_parked_stage(spark, cow):
    cow.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    token = cow.merge_staged(mk(spark, [("c", 3)]), batch_id=1)
    with pytest.raises(ValueError, match="staged"):
        cow.purge_keys("a")
    cow.abandon_staged(token)
    assert cow.purge_keys("a")["rows_purged"] == 1
