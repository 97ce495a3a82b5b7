"""ParquetLakeTable: MERGE semantics, snapshot isolation, idempotent
batch commits, bucket-targeted rewrite, schema evolution.

The MERGE behavior being tested replaces the reference's typed-store
applier (typeStore/Sequelize.ts:28-191: add->INSERT, replace->UPDATE,
remove->DELETE)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import ParquetLakeTable


def _pdf(df):
    return df.toPandas().sort_values("url").reset_index(drop=True)


@pytest.fixture()
def table(spark, tmp_path):
    return ParquetLakeTable(spark, str(tmp_path / "pages"), key="url", n_buckets=4)


def mk(spark, rows, schema="url string, v int"):
    return spark.createDataFrame(rows, schema=schema)


def test_insert_update_delete(spark, table):
    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=0)
    assert _pdf(table.read()).v.tolist() == [1, 1]

    # update a, insert c (WHEN MATCHED UPDATE / NOT MATCHED INSERT)
    table.merge(mk(spark, [("a", 2), ("c", 1)]), batch_id=1)
    got = _pdf(table.read())
    assert got.url.tolist() == ["a", "b", "c"] and got.v.tolist() == [2, 1, 1]

    # delete b (WHEN MATCHED AND op=delete THEN DELETE)
    table.merge(None, delete_keys=mk(spark, [("b",)], "url string"), batch_id=2)
    assert _pdf(table.read()).url.tolist() == ["a", "c"]


def test_batch_id_idempotence(spark, table):
    table.merge(mk(spark, [("a", 1)]), batch_id=7)
    # refired micro-batch: same batch_id must be a no-op
    assert table.merge(mk(spark, [("a", 999)]), batch_id=7) is False
    assert _pdf(table.read()).v.tolist() == [1]
    assert table.applied_batch_ids() == {7}


def test_snapshot_isolation_and_time_travel(spark, table):
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    v0 = table.current_version()
    table.merge(mk(spark, [("a", 2), ("b", 5)]), batch_id=1)
    assert _pdf(table.read(version=v0)).v.tolist() == [1]  # old snapshot intact
    assert _pdf(table.read()).v.tolist() == [2, 5]


def test_only_touched_buckets_rewritten(spark, table):
    big = mk(spark, [(f"url{i}", i) for i in range(40)])
    table.merge(big, batch_id=0)
    m0 = table._manifest()
    table.merge(mk(spark, [("url0", 99)]), batch_id=1)
    m1 = table._manifest()
    unchanged = [
        b for b in m0["buckets"] if m0["buckets"][b] == m1["buckets"][b]
    ]
    # url0 hits exactly one bucket; the other buckets' files are reused
    assert len(unchanged) == len(m0["buckets"]) - 1


def test_lookup_prunes_to_key_buckets(spark, table):
    """Point lookup scans only the target key's bucket files (1/n_buckets
    of the table), result identical to a full-scan filter."""
    big = mk(spark, [(f"url{i}", i) for i in range(60)])
    table.merge(big, batch_id=0)

    all_files = set(table.read().inputFiles())
    got = table.lookup("url7")
    looked_files = set(got.inputFiles())
    assert looked_files and looked_files < all_files
    assert len(looked_files) <= len(all_files) // 2  # 1 of 4 buckets
    assert _pdf(got).v.tolist() == [7]

    # multi-key lookup unions the (deduped) bucket set
    got2 = _pdf(table.lookup("url7", "url13", "definitely-absent"))
    assert got2.url.tolist() == ["url13", "url7"] and got2.v.tolist() == [13, 7]

    # pushed filter reaches the parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "url7" in plan


def test_data_files_key_sorted_within_bucket(spark, table):
    """Every data file is key-sorted: parquet then records tight min/max
    key ranges per row group, so lookup()'s pushed equality skips all but
    one row group per file — the second half of the point-read path
    (bucket pruning picks the files, row-group stats prune within them)."""
    import pyarrow.parquet as pq

    table.merge(mk(spark, [(f"url{i:04d}", i) for i in range(500)]), batch_id=0)
    files = table.read().inputFiles()
    assert files
    for f in files:
        keys = pq.read_table(f.replace("file:", ""), columns=["url"])["url"].to_pylist()
        assert keys == sorted(keys), f"unsorted data file {f}"


def test_files_per_bucket_parallel_writes_stay_sorted_and_disjoint(spark, tmp_path):
    """files_per_bucket > 1 range-splits each bucket into key-disjoint,
    individually key-sorted files (parallel write tasks for big COW
    rewrites) — reads, lookups and pruning semantics unchanged."""
    import pyarrow.parquet as pq

    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=2, files_per_bucket=3
    )
    t.merge(mk(spark, [(f"url{i:04d}", i) for i in range(600)]), batch_id=0)
    m = t._manifest()
    assert any(len(fl) > 1 for fl in m["buckets"].values())  # buckets split
    for fl in m["buckets"].values():
        ranges = []
        for f in fl:
            keys = pq.read_table(f, columns=["url"])["url"].to_pylist()
            assert keys == sorted(keys), f"unsorted file {f}"
            ranges.append((keys[0], keys[-1]))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo, "bucket files overlap in key range"
    assert t.read().count() == 600
    assert _pdf(t.lookup("url0042")).v.tolist() == [42]


def test_rebucket_rehashes_preserving_state_and_batch_ids(spark, tmp_path):
    """rebucket() is the sanctioned layout change: content identical,
    lookups route via the new hash, applied batch_ids survive (refires
    still no-op), old snapshots still time-travel, and a reopen adopts
    the new recorded n_buckets."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2, mode="mor")
    t.merge(mk(spark, [(f"url{i}", i) for i in range(40)]), batch_id=0)
    t.merge(
        mk(spark, [("url3", 300)]),
        delete_keys=mk(spark, [("url5",)], "url string"),
        batch_id=1,
    )  # leave MOR deltas outstanding — rebucket must fold them
    v_before = t.current_version()
    stats = t.rebucket(8)
    assert stats["n_buckets"] == 8 and t.n_buckets == 8
    got = _pdf(t.read())
    assert len(got) == 39 and got.set_index("url").v.loc["url3"] == 300
    assert _pdf(t.lookup("url3")).v.tolist() == [300]
    assert t._manifest()["deltas"] == {}  # deltas folded by the rewrite
    # refire of an already-applied batch is still a no-op after rebucket
    assert t.merge(mk(spark, [("url3", 999)]), batch_id=1) is False
    # old snapshot still time-travels under the old layout
    assert t.read(version=v_before).count() == 39
    # reopen adopts the recorded layout, not the constructor default
    re = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    assert re.n_buckets == 8
    assert _pdf(re.lookup("url7")).v.tolist() == [7]


def test_merge_retries_on_commit_conflict(spark, tmp_path):
    """Optimistic concurrency: when another writer (a maintenance job, a
    second pipeline) commits the version a merge was about to claim, the
    merge must lose the manifest CAS, recompute against the winner's
    manifest, and commit on top — BOTH commits' rows and batch_ids land,
    nothing is silently overwritten out of the manifest chain."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)

    competitor = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    orig = t._write_buckets
    raced = {"n": 0}

    def racing_write(df, version, **kw):
        files = orig(df, version, **kw)
        if raced["n"] == 0:  # steal the version exactly once, mid-commit
            raced["n"] += 1
            assert competitor.merge(mk(spark, [("x", 99)]), batch_id=100)
        return files

    t._write_buckets = racing_write
    assert t.merge(mk(spark, [("y", 7), ("a", 10)]), batch_id=1) is True
    assert raced["n"] == 1
    got = _pdf(t.read()).set_index("url").v
    assert got.to_dict() == {"a": 10, "b": 2, "x": 99, "y": 7}
    assert {0, 1, 100} <= t.applied_batch_ids()
    assert t.current_version() == 2  # batch0 = v0, competitor = v1, retried merge = v2
    # losing attempt's orphaned files are reclaimed once manifests age out
    t.merge(mk(spark, [("z", 1)]), batch_id=2)
    t.expire_snapshots(keep_last=1)
    assert _pdf(t.read()).set_index("url").v.to_dict() == {
        "a": 10, "b": 2, "x": 99, "y": 7, "z": 1
    }


def test_crash_between_cas_and_pointer_swap_is_durable(spark, tmp_path):
    """A writer that crashes AFTER winning the version CAS but BEFORE the
    _CURRENT swap has durably committed: readers still see the old
    snapshot (consistent), but the refire guard treats the batch as
    applied and the next commit chains from the crashed one — no
    double-apply, no lost commit."""
    import os

    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1)]), batch_id=0)

    # simulate the crash window: commit v1 normally, then roll the
    # _CURRENT pointer back to v0 (v1.json stays — it won its CAS)
    t.merge(mk(spark, [("b", 2)]), batch_id=1)
    with open(os.path.join(t.path, "_CURRENT"), "w") as f:
        f.write("0")

    re = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    assert re.read().count() == 1  # readers: published snapshot only
    assert 1 in re.applied_batch_ids()  # refire guard: batch 1 IS applied
    assert re.merge(mk(spark, [("b", 99)]), batch_id=1) is False  # no-op
    # a new batch chains from the crashed-but-durable v1, republishing it
    assert re.merge(mk(spark, [("c", 3)]), batch_id=2) is True
    got = _pdf(re.read()).set_index("url").v.to_dict()
    assert got == {"a": 1, "b": 2, "c": 3}


def test_schema_evolution_adds_column(spark, table):
    table.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    widened = spark.createDataFrame(
        [("c", 3, "en")], schema="url string, v int, lang string"
    )
    table.merge(widened, batch_id=1)
    got = _pdf(table.read())
    assert got.columns.tolist() == ["url", "v", "lang"]
    assert got.lang.tolist() == [None, None, "en"]
    # and old rows remain updatable under the new schema
    table.merge(
        spark.createDataFrame([("a", 9, "de")], schema="url string, v int, lang string"),
        batch_id=2,
    )
    got = _pdf(table.read())
    assert got[got.url == "a"].lang.tolist() == ["de"]


def test_overwrite_then_merge(spark, table):
    table.overwrite(mk(spark, [("a", 1), ("b", 2)]))
    table.merge(mk(spark, [("b", 3)]), batch_id=5)
    got = _pdf(table.read())
    assert got.v.tolist() == [1, 3]


def test_expire_snapshots_bounds_disk_keeps_current(spark, table):
    import glob
    import os

    for i in range(5):
        table.merge(mk(spark, [("a", i), (f"k{i}", i)]), batch_id=i)
    assert table.current_version() == 4
    n_files_before = len(glob.glob(f"{table.path}/data/**/*.parquet", recursive=True))

    out = table.expire_snapshots(keep_last=2)
    assert out["kept"] == [3, 4] and out["dropped_manifests"] == 3
    assert out["deleted_files"] > 0
    n_files_after = len(glob.glob(f"{table.path}/data/**/*.parquet", recursive=True))
    assert n_files_after < n_files_before

    # current snapshot fully readable; final state correct
    got = _pdf(table.read())
    assert got[got.url == "a"].v.tolist() == [4]
    assert set(got.url) == {"a", "k0", "k1", "k2", "k3", "k4"}
    # time travel within the kept window still works
    prev = _pdf(table.read(version=3))
    assert prev[prev.url == "a"].v.tolist() == [3]
    # batch-id idempotence survives expiry (refire of old batch is a no-op)
    assert table.merge(mk(spark, [("a", 99)]), batch_id=2) is False
    assert _pdf(table.read())[lambda d: d.url == "a"].v.tolist() == [4]


def test_lineage_tracks_buckets_and_batches(spark, table):
    table.merge(mk(spark, [("a", 1), ("b", 1), ("c", 1)]), batch_id=0)
    table.merge(mk(spark, [("a", 2)]), batch_id=1)  # only a's bucket rewritten
    lin = table.lineage()
    assert [r["version"] for r in lin] == [0, 1]
    assert [r["batch_id"] for r in lin] == [0, 1]
    assert lin[0]["parent"] == -1 and lin[1]["parent"] == 0
    # second commit touched strictly fewer buckets than the first
    assert set(lin[1]["buckets_rewritten"]) < set(lin[0]["buckets_rewritten"]) or (
        len(lin[1]["buckets_rewritten"]) <= len(lin[0]["buckets_rewritten"])
    )
    assert len(lin[1]["buckets_rewritten"]) == 1


def test_expire_snapshots_survives_path_respelling(spark, tmp_path):
    """Opening the same table under a different path spelling (relative hop
    + trailing slash) must not make expire_snapshots treat live files as
    orphans — paths are realpath-normalized on both sides."""
    t = ParquetLakeTable(spark, str(tmp_path / "tbl"), key="url", n_buckets=4)
    t.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=0)
    t.merge(mk(spark, [("a", 2)]), batch_id=1)
    alt_spelling = str(tmp_path / "x" / ".." / "tbl") + "/"
    t2 = ParquetLakeTable(spark, alt_spelling, key="url", n_buckets=4)
    assert t2.path == t.path
    out = t2.expire_snapshots(keep_last=1)
    assert out["kept"] == [1]
    got = _pdf(t2.read())
    assert got.url.tolist() == ["a", "b"] and got.v.tolist() == [2, 1]


def test_expire_snapshots_skips_inflight_newer_data_dirs(spark, table):
    """Files written by a not-yet-committed merge (data dir version > the
    current manifest) must survive a concurrent expire."""
    import os

    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    inflight = os.path.join(table.path, "data", "v99-deadbeef")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as f:
        f.write(b"not yet committed")
    table.expire_snapshots(keep_last=1)
    assert os.path.exists(os.path.join(inflight, "part-0.parquet"))


def test_iceberg_merge_source_contract(spark):
    """build_merge_source (the Iceberg MERGE's source relation) without a
    catalog: upsert-wins on key overlap, exactly one row per key (Iceberg
    raises a cardinality error otherwise), delete rows null-filled,
    _batch_id stamped on written rows."""
    from gnarly_spark.sinks.lake import build_merge_source

    up = mk(spark, [("a", 1), ("b", 2)])
    dk = mk(spark, [("a", 0), ("c", 0)]).select("url")  # 'a' overlaps
    src = build_merge_source(up, dk, key="url", batch_id=7)
    rows = {r.url: r for r in src.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert src.count() == 3  # one source row per target key
    assert rows["a"]._op == "upsert" and rows["a"].v == 1  # upsert wins
    assert rows["b"]._op == "upsert" and rows["b"]._batch_id == 7
    assert rows["c"]._op == "delete" and rows["c"].v is None


def test_iceberg_merge_sql_contract():
    """The generated MERGE INTO text: matched-delete clause first, _op never
    written to the target, _batch_id is."""
    from gnarly_spark.sinks.lake import build_merge_sql

    sql = build_merge_sql(
        "lake.db.pages", "url", ["url", "v", "_op", "_batch_id"]
    )
    assert "MERGE INTO lake.db.pages t USING _cdc_src u ON t.url = u.url" in sql
    assert "WHEN MATCHED AND u._op = 'delete' THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.url = u.url, t.v = u.v, t._batch_id = u._batch_id" in sql
    assert (
        "WHEN NOT MATCHED AND u._op != 'delete' THEN "
        "INSERT (url, v, _batch_id) VALUES (u.url, u.v, u._batch_id)" in sql
    )
    assert "t._op" not in sql and "INSERT (url, v, _batch_id)" in sql


def test_snapshot_diff_change_feed(spark, table):
    """diff(v_from, v_to): the table as a CDC SOURCE — insert/update/delete
    per key between snapshots, null fields compared null-safely."""
    table.merge(mk(spark, [("a", 1), ("b", 1), ("c", None)]), batch_id=0)
    table.merge(mk(spark, [("a", 2), ("d", 4)]), delete_keys=mk(spark, [("b", 0)]).select("url"), batch_id=1)
    got = {r.url: r._change for r in table.diff(0, 1).collect()}
    assert got == {"a": "update", "b": "delete", "d": "insert"}  # c unchanged (null field)
    assert table.diff(1, 1).count() == 0


def test_changelog_emits_before_after_images(spark, table):
    """changelog(v_from, v_to): the image-carrying feed — updates fan out
    to an update_before/update_after PAIR carrying old and new row values,
    deletes carry the old image, inserts the new one; unchanged rows
    (null-safely compared) never appear. This is the shape downstream
    incremental consumers (operators/mv.py) retract/apply from."""
    table.merge(mk(spark, [("a", 1), ("b", 1), ("c", None)]), batch_id=0)
    table.merge(
        mk(spark, [("a", 2), ("d", 4)]),
        delete_keys=mk(spark, [("b", 0)]).select("url"),
        batch_id=1,
    )
    rows = {(r.url, r._change_type): r.v for r in table.changelog(0, 1).collect()}
    assert rows == {
        ("a", "update_before"): 1,
        ("a", "update_after"): 2,
        ("b", "delete"): 1,
        ("d", "insert"): 4,
    }
    assert table.changelog(1, 1).count() == 0


def test_incremental_mv_matches_recompute(spark, table):
    """maintain_sum_mv: bootstrapping a COUNT/SUM view at v1 and folding
    changelog(v1) in must equal a direct recompute over v2 — including a
    group that vanishes entirely (its row count reaches zero)."""
    from gnarly_spark.operators.mv import maintain_sum_mv

    rows = [(f"u{i}", i % 3, float(i)) for i in range(12)]
    schema = "url string, grp int, val double"
    table.merge(spark.createDataFrame(rows, schema=schema), batch_id=0)
    v1 = table.current_version()
    # batch 2: move u1 across groups, change u4's value, delete ALL of grp 2
    table.merge(
        spark.createDataFrame([("u1", 0, 99.0), ("u4", 1, 40.0)], schema=schema),
        delete_keys=spark.createDataFrame(
            [(f"u{i}",) for i in range(12) if i % 3 == 2], "url string"
        ),
        batch_id=1,
    )
    mv1 = (
        table.read(v1)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("val").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("sum_value"),
        )
    )
    got = maintain_sum_mv(
        mv1, table.changelog(v1), "grp", "val"
    ).toPandas().set_index("grp").sort_index()
    want = (
        table.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("val").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .alias("sum_value"),
        )
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    assert got.n_rows.to_dict() == want.n_rows.to_dict()
    assert got.sum_value.astype(float).to_dict() == want.sum_value.astype(float).to_dict()
    assert 2 not in got.index  # vanished group dropped, as recompute would


def test_lookup_zone_map_prunes_files_within_bucket(spark, tmp_path):
    """Manifest-recorded per-file key bounds (footer stats, Iceberg
    column-bounds analog): with files_per_bucket>1 the range-split files
    are key-disjoint, so a point lookup must plan a scan over ~1 file —
    not every file in the routed bucket — and an out-of-range key must
    read zero files."""
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=1, files_per_bucket=4
    )
    t.merge(
        spark.createDataFrame(
            [(f"url{i:04d}", i) for i in range(400)], "url string, v int"
        ),
        batch_id=0,
    )
    all_files = t._manifest()["buckets"]["0"]
    assert len(all_files) > 1  # range split actually produced several files
    assert set(t._manifest()["bounds"]) == set(all_files)  # bounds recorded
    hit = t.lookup("url0007")
    assert [(r.url, r.v) for r in hit.collect()] == [("url0007", 7)]
    assert len(hit.inputFiles()) == 1  # zone map pruned the other files
    # key lexically outside every file's range: no files planned at all
    assert t.lookup("zzz").count() == 0


def test_restore_rolls_back_as_forward_commit(spark, table):
    """restore(v): rollback-to-snapshot as a NEW commit — state reverts,
    history stays linear (pointer moves forward), batch ids applied after
    the restored snapshot stop being durably applied so a stream refires
    them, and time travel to the rolled-back version still works."""
    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=0)
    v1 = table.current_version()
    table.merge(
        mk(spark, [("a", 2), ("c", 3)]),
        delete_keys=mk(spark, [("b", 0)]).select("url"),
        batch_id=1,
    )
    v2 = table.current_version()
    v3 = table.restore(v1)
    assert v3 > v2
    got = _pdf(table.read())
    assert got.url.tolist() == ["a", "b"] and got.v.tolist() == [1, 1]
    # batch 1 is no longer durably applied — a refire re-applies it
    assert table.applied_batch_ids() == {0}
    assert table.merge(
        mk(spark, [("a", 2), ("c", 3)]),
        delete_keys=mk(spark, [("b", 0)]).select("url"),
        batch_id=1,
    )
    assert _pdf(table.read()).url.tolist() == ["a", "c"]
    # the rolled-back snapshot remains time-travel readable
    assert _pdf(table.read(version=v2)).url.tolist() == ["a", "c"]
    with pytest.raises(ValueError):
        table.restore(99)


def test_write_audit_publish(spark, table):
    """WAP: a staged merge is invisible to readers and not durably applied
    until publish; the audit surface (read_staged) sees the staged state;
    publish makes it the next version atomically."""
    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=0)
    v1 = table.current_version()
    tok = table.merge_staged(mk(spark, [("a", 2), ("c", 3)]), batch_id=1)
    assert tok is not None
    assert _pdf(table.read_staged(tok)).v.tolist() == [2, 1, 3]
    assert _pdf(table.read()).v.tolist() == [1, 1]  # readers unaffected
    assert table.applied_batch_ids() == {0}  # batch 1 not durable yet
    v2 = table.publish_staged(tok)
    assert v2 > v1 and _pdf(table.read()).v.tolist() == [2, 1, 3]
    assert table.applied_batch_ids() == {0, 1}
    with pytest.raises(FileNotFoundError):  # stage consumed by publish
        table.read_staged(tok)
    # an already-applied batch stages as a no-op
    assert table.merge_staged(mk(spark, [("a", 7)]), batch_id=1) is None


def test_abandon_staged_drops_new_files_and_frees_batch(spark, table):
    """Abandoning a stage deletes the files written for it, leaves the
    table untouched, and frees the batch_id for a clean re-merge (the
    quarantine-then-redeliver path of a data-quality gate)."""
    import json as _json
    import os as _os

    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    cur = table.current_version()
    tok = table.merge_staged(mk(spark, [("a", 99), ("b", 2)]), batch_id=1)
    with open(table._staged_path(tok)) as f:
        staged_m = _json.load(f)
    new_files = [
        f
        for fl in staged_m["buckets"].values()
        for f in fl
        if f"/v{cur + 1}-" in f
    ]
    assert new_files
    table.abandon_staged(tok)
    assert _pdf(table.read()).v.tolist() == [1]
    assert table.applied_batch_ids() == {0}
    assert all(not _os.path.exists(f) for f in new_files)
    # the batch can be re-delivered normally afterwards
    assert table.merge(mk(spark, [("a", 99), ("b", 2)]), batch_id=1)
    assert _pdf(table.read()).v.tolist() == [99, 2]


def test_publish_staged_conflicts_with_interleaved_commit(spark, table):
    """A commit landing between stage and publish invalidates the stage's
    survivor rewrite — publish must refuse (optimistic concurrency), not
    silently drop the interleaved commit's rows."""
    from gnarly_spark.sinks.lake import CommitConflict

    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    tok = table.merge_staged(mk(spark, [("a", 2)]), batch_id=1)
    table.merge(mk(spark, [("z", 9)]), batch_id=2)  # interleaved writer
    with pytest.raises(CommitConflict):
        table.publish_staged(tok)


def test_merge_adopts_layout_from_concurrent_rebucket(spark, tmp_path):
    """An ingest handle opened before a concurrent rebucket() must hash
    with the NEW layout when it next merges (it builds on the rebucketed
    manifest): old copies of upserted keys are replaced, lookups route,
    and the manifest keeps the new n_buckets — not the handle's stale
    __init__-time count stamped back over it."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    ingest = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    ingest.merge(mk(spark, [(f"url{i}", i) for i in range(20)]), batch_id=0)

    maint = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    maint.rebucket(8)

    # stale handle merges: update an existing key + insert a new one
    assert ingest.merge(mk(spark, [("url3", 300), ("new", 1)]), batch_id=1)
    assert ingest.n_buckets == 8  # adopted mid-merge
    assert ingest._manifest()["n_buckets"] == 8
    got = _pdf(ingest.read()).set_index("url").v.to_dict()
    assert got["url3"] == 300 and got["new"] == 1 and len(got) == 21
    # no duplicate row for url3 under the old hash, and lookup routes
    assert _pdf(ingest.lookup("url3")).v.tolist() == [300]


def test_lookup_adopts_layout_from_concurrent_rebucket(spark, tmp_path):
    """A READER handle opened before a concurrent rebucket() must compute
    bucket ids with the layout of the manifest it reads: hashing with the
    stale __init__-time count scans the wrong buckets and silently returns
    empty for keys that exist (the reader-side twin of the writer's
    _adopt_layout hazard)."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    writer = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    writer.merge(mk(spark, [(f"url{i}", i) for i in range(20)]), batch_id=0)

    reader = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    assert _pdf(reader.lookup("url3")).v.tolist() == [3]  # sanity pre-rebucket

    writer.rebucket(8)

    # stale reader: every key must still resolve under the new layout
    for k in ("url3", "url7", "url19"):
        got = _pdf(reader.lookup(k))
        assert got.v.tolist() == [int(k[3:])], f"lookup({k}) missed after rebucket"
    # and the lookup still prunes (scans a strict subset of the table files)
    all_files = set(reader.read().inputFiles())
    looked = set(reader.lookup("url3").inputFiles())
    assert looked and looked < all_files


def test_current_pointer_never_moves_backward(spark, tmp_path):
    """_publish is a guarded swap: a stalled winner's late pointer write
    for an OLDER version must be a no-op once a newer version published
    (otherwise readers time-travel backward and expire_snapshots computes
    its keep window from a regressed head)."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1)]), batch_id=0)  # v0
    t.merge(mk(spark, [("b", 2)]), batch_id=1)  # v1
    assert t.current_version() == 1
    t._publish(0)  # the stalled winner's late swap
    assert t.current_version() == 1


def test_incompatible_type_change_rejected(spark, table):
    """A batch delivering an existing numeric column as string must be
    rejected, not silently flip the table column's type forever."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    with pytest.raises(ValueError, match="incompatible type.*'v'"):
        table.merge(
            mk(spark, [("b", "oops")], schema="url string, v string"),
            batch_id=1,
        )
    # sanctioned widening still works (int -> bigint)
    table.merge(
        mk(spark, [("c", 2**40)], schema="url string, v bigint"), batch_id=2
    )
    assert dict(
        (f.name, f.dataType.simpleString())
        for f in table.read().schema.fields
    )["v"] == "bigint"


def test_small_merge_does_not_explode_file_count(spark, tmp_path):
    """files_per_bucket range-splits scale to the buckets a commit actually
    writes: a merge touching 1 of 16 buckets on an fpb=4 table must write
    ~fpb files for that bucket, not scatter it across 64 range partitions."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=16, files_per_bucket=4
    )
    t.merge(mk(spark, [(f"url{i}", i) for i in range(200)]), batch_id=0)
    # single-key merge: exactly one bucket rewritten
    assert t.merge(mk(spark, [("url7", 700)]), batch_id=1)
    m = t._manifest()
    from gnarly_spark.sinks.lake import bucket_of
    b = spark.createDataFrame([("url7",)], "url string").select(
        bucket_of(F.col("url"), 16).alias("b")
    ).collect()[0].b
    assert len(m["buckets"][str(b)]) <= 4
    assert _pdf(t.lookup("url7")).v.tolist() == [700]


def test_maintenance_cow_compact_preserves_batch_ids(spark, tmp_path):
    """The COW --compact maintenance path must keep the refire guard and
    go through the CAS (rebucket-at-same-count), never overwrite()."""
    from jobs.maintenance_job import main
    from gnarly_spark.sinks.lake import ParquetLakeTable

    p = str(tmp_path / "t")
    t = ParquetLakeTable(spark, p, key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    t.merge(mk(spark, [("a", 10)]), batch_id=1)
    main(["--table", p, "--compact", "--keep-last", "10"])
    re = ParquetLakeTable(spark, p, key="url")
    assert {0, 1} <= re.applied_batch_ids()  # refire guard survived
    assert re.merge(mk(spark, [("a", 999)]), batch_id=1) is False  # no-op
    assert _pdf(re.read()).set_index("url").v.to_dict() == {"a": 10, "b": 2}


def test_case_only_rename_feeds_existing_column(spark, tmp_path):
    """A batch delivering 'V' for table column 'v' must feed the EXISTING
    column (Spark resolves case-insensitively by default) — not fork a new
    'V' column while null-filling 'v'."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    t.merge(mk(spark, [("a", 10)], schema="url string, V int"), batch_id=1)
    got = t.read()
    assert [c.lower() for c in got.columns].count("v") == 1
    rows = {r.url: r.v for r in got.collect()}
    assert rows == {"a": 10, "b": 2}
    # ambiguous batch (both cases present) is rejected, not silently merged
    import pytest as _pytest

    with _pytest.raises(ValueError, match="case"):
        t.merge(
            mk(spark, [("a", 1, 2)], schema="url string, v int, V int"),
            batch_id=2,
        )


def test_scan_range_prunes_files_by_secondary_zone_map(spark, tmp_path):
    """stats_columns=("ts",): per-file [min,max] of a NON-key column land
    in the manifest at commit, and scan_range plans a scan over only the
    overlapping files — a time-window serving read opens the window's
    commits, not the table."""
    import datetime as dt

    from gnarly_spark.sinks.lake import bucket_of

    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=3, stats_columns=("ts",)
    )
    day = dt.datetime(2026, 8, 14)
    # route each day's keys to a DISTINCT bucket (the time-correlated
    # commit pattern: a day's ingest touches its own buckets), so each
    # base file carries one day's tight ts range
    cand = spark.createDataFrame(
        [(f"u{i:03d}",) for i in range(60)], "url string"
    ).select("url", bucket_of(F.col("url"), 3).alias("b"))
    by_bucket: dict[int, list[str]] = {}
    for r in cand.collect():
        by_bucket.setdefault(r.b, []).append(r.url)
    assert set(by_bucket) == {0, 1, 2}
    for d in range(3):
        rows = [
            (u, day + dt.timedelta(days=d, hours=i % 24))
            for i, u in enumerate(by_bucket[d][:4])
        ]
        t.merge(
            spark.createDataFrame(rows, "url string, ts timestamp"), batch_id=d
        )
    m = t._manifest()
    files = [f for fl in m["buckets"].values() for f in fl]
    assert set(m["col_bounds"]["ts"]) == set(files) and len(files) == 3

    mid = t.scan_range(
        "ts", day + dt.timedelta(days=1), day + dt.timedelta(days=1, hours=23)
    )
    assert sorted(r.url for r in mid.collect()) == sorted(by_bucket[1][:4])
    assert len(mid.inputFiles()) == 1  # day-0/day-2 files skipped
    # open-ended bounds + rows equal a plain filtered read
    tail = t.scan_range("ts", lo=day + dt.timedelta(days=2))
    assert tail.count() == 4
    assert t.scan_range("ts", hi=day - dt.timedelta(days=1)).count() == 0
    # reopening WITHOUT the arg adopts the table's recorded stats columns
    t2 = ParquetLakeTable(spark, str(tmp_path / "t"), key="url")
    assert t2.stats_columns == ("ts",)
    t2.merge(
        spark.createDataFrame(
            [("late", day + dt.timedelta(days=9))], "url string, ts timestamp"
        ),
        batch_id=3,
    )
    assert len(t2._manifest()["col_bounds"]["ts"]) == len(
        [f for fl in t2._manifest()["buckets"].values() for f in fl]
    )


def test_scan_range_key_column_prunes_even_on_mor(spark, tmp_path):
    """Key-range pruning is sound with outstanding deltas (all rows of a
    key share its key): scan_range on the key must prune AND resolve the
    MOR winner."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=1, mode="mor")
    t.merge(mk(spark, [("a", 1), ("m", 1), ("z", 1)]), batch_id=0)
    t.merge(mk(spark, [("m", 2)]), batch_id=1)  # delta supersedes base 'm'
    got = {(r.url, r.v) for r in t.scan_range("url", "m", "n").collect()}
    assert got == {("m", 2)}


def test_scan_range_nonkey_on_mor_falls_back_soundly(spark, tmp_path):
    """A non-key range over outstanding deltas must NOT file-prune: a
    delta moving a key OUT of the range would be pruned away and the
    stale base row (inside the range) would resurrect. Expect the
    resolved-then-filtered answer; after compact() pruning returns."""
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=1, mode="mor",
        stats_columns=("v",),
    )
    t.merge(mk(spark, [("a", 10), ("b", 20)]), batch_id=0)
    t.merge(mk(spark, [("a", 999)]), batch_id=1)  # 'a' leaves [0, 100]
    got = {(r.url, r.v) for r in t.scan_range("v", 0, 100).collect()}
    assert got == {("b", 20)}  # stale (a,10) must NOT resurrect
    t.compact()
    got2 = t.scan_range("v", 0, 100)
    assert {(r.url, r.v) for r in got2.collect()} == {("b", 20)}


def test_stats_columns_rejects_key_and_bools(spark, tmp_path):
    with pytest.raises(ValueError, match="stats_columns"):
        ParquetLakeTable(spark, str(tmp_path / "t"), key="url", stats_columns=("url",))
    from gnarly_spark.sinks.lake import _norm_stat
    assert _norm_stat(True) is None  # bool bounds are noise, not pruned on
    assert _norm_stat(b"ab") == "ab" and _norm_stat(3.5) == 3.5


def _xy_rows(spark, n=4096):
    # x cycles with row order, y is decorrelated (multiplicative hash) —
    # the key-sorted layout is bad for BOTH columns, so any post-cluster
    # pruning is attributable to the z-order rewrite
    return spark.range(n).select(
        F.format_string("url%05d", F.col("id")).alias("url"),
        (F.col("id") % 64).cast("int").alias("x"),
        ((F.col("id") * 2654435761) % 64).cast("int").alias("y"),
    )


def test_cluster_zorder_enables_multi_column_file_skipping(spark, tmp_path):
    """cluster(by=[x, y]) (OPTIMIZE ZORDER BY analog): after the rewrite
    each file covers a small (x, y) rectangle, so scan_range on EITHER
    column file-skips — where the key-sorted layout pruned nothing."""
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=1, files_per_bucket=16
    )
    t.merge(_xy_rows(spark), batch_id=0)
    total = len(t.read().inputFiles())
    assert total >= 12
    # no stats_columns declared yet -> nothing prunable pre-cluster
    assert len(t.scan_range("x", 0, 7).inputFiles()) == total

    info = t.cluster(by=["x", "y"])
    assert info["clustered_by"] == ["x", "y"]
    m = t._manifest()
    assert m["clustered_by"] == ["x", "y"]
    # cluster auto-added the by-columns to the recorded stats columns
    assert set(m["stats_columns"]) == {"x", "y"}

    post_x = t.scan_range("x", 0, 7)
    post_y = t.scan_range("y", 0, 7)
    # an eighth-of-domain slice on either dimension opens well under half
    # the files (ideal ~1/4 with 16 files in 2-D; margin for the range
    # sampler's straddle files)
    assert len(post_x.inputFiles()) <= total // 2
    assert len(post_y.inputFiles()) <= total // 2
    # and the pruned scans return exactly the filtered rows
    assert sorted(r.url for r in post_x.collect()) == sorted(
        f"url{i:05d}" for i in range(4096) if i % 64 <= 7
    )
    assert post_y.count() == sum(
        1 for i in range(4096) if (i * 2654435761) % 64 <= 7
    )


def test_cluster_preserves_state_batch_ids_and_time_travel(spark, tmp_path):
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=2, files_per_bucket=4
    )
    rows = _xy_rows(spark, 512)
    t.merge(rows, batch_id=0)
    pre = {(r.url, r.x, r.y) for r in t.read().collect()}
    v_pre = t.current_version()
    t.cluster(by=["x", "y"], bits=4)
    assert {(r.url, r.x, r.y) for r in t.read().collect()} == pre
    # batch ids carried over -> a refired batch is still a no-op
    assert t.merge(rows, batch_id=0) is False
    # the pre-cluster snapshot still time-travels
    assert t.read(version=v_pre).count() == 512
    # lookup still routes and answers correctly on the clustered layout
    assert t.lookup("url00042").count() == 1
    # a later merge keeps working (new files are key-ordered again)
    t.merge(
        spark.createDataFrame([("zzz", 1, 2)], "url string, x int, y int"),
        batch_id=1,
    )
    assert t.read().count() == 513


def test_cluster_folds_mor_deltas_and_validates_args(spark, tmp_path):
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=2, mode="mor"
    )
    t.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    t.merge(mk(spark, [("b", 20)]), batch_id=1)  # outstanding delta
    t.cluster(by=["v"], bits=4)
    m = t._manifest()
    assert not any(fl for fl in m.get("deltas", {}).values())  # folded
    assert {(r.url, r.v) for r in t.read().collect()} == {
        ("a", 1), ("b", 20), ("c", 3)
    }
    # with deltas folded, the non-key range scan is file-prunable again
    assert {(r.url, r.v) for r in t.scan_range("v", 0, 5).collect()} == {
        ("a", 1), ("c", 3)
    }
    with pytest.raises(ValueError, match="at least one"):
        t.cluster(by=[])
    with pytest.raises(ValueError, match="duplicate"):
        t.cluster(by=["v", "v"])
    with pytest.raises(ValueError, match="bits"):
        t.cluster(by=["v"], bits=40)
    with pytest.raises(ValueError, match="not in table schema"):
        t.cluster(by=["nope"])


def test_maintenance_job_cluster_flag(spark, tmp_path):
    """--cluster x,y drives the z-order rewrite from the maintenance CLI
    and records the clustered columns' bounds for later scan_range use."""
    from jobs.maintenance_job import main

    p = str(tmp_path / "t")
    t = ParquetLakeTable(spark, p, key="url", n_buckets=1, files_per_bucket=8)
    t.merge(_xy_rows(spark, 1024), batch_id=0)
    # files_per_bucket is a write knob, not a manifest fact — the job
    # must be told how wide to write the clustered rewrite
    main(["--table", p, "--cluster", "x,y", "--cluster-bits", "4",
          "--files-per-bucket", "8", "--keep-last", "10"])
    re = ParquetLakeTable(spark, p, key="url")
    m = re._manifest()
    assert m["clustered_by"] == ["x", "y"]
    assert set(m["stats_columns"]) == {"x", "y"}
    assert re.read().count() == 1024
    assert len(re.scan_range("x", 0, 7).inputFiles()) < len(
        re.read().inputFiles()
    )


def test_reopen_with_wrong_key_is_refused(spark, tmp_path):
    """The merge key seeds the bucket hash — a reopen with a different key
    (e.g. a maintenance job defaulting --key url on an event_key table)
    must fail loudly, not silently re-route buckets on the next rewrite."""
    p = str(tmp_path / "t")
    t = ParquetLakeTable(spark, p, key="event_key", n_buckets=2)
    t.merge(
        spark.createDataFrame([("e1", "u", 1)], "event_key string, url string, v int"),
        batch_id=0,
    )
    with pytest.raises(ValueError, match="keyed by 'event_key'"):
        ParquetLakeTable(spark, p, key="url")
    # the recorded key still opens fine
    assert ParquetLakeTable(spark, p, key="event_key").read().count() == 1


def test_scan_box_intersects_zone_maps_on_clustered_layout(spark, tmp_path):
    """scan_box intersects per-column file sets: on a z-ordered table a
    2-D box opens no more files than either 1-D slice, and returns
    exactly the conjunctive filter's rows. On MOR with outstanding
    deltas a non-key box falls back soundly to the resolved read."""
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=1, files_per_bucket=16
    )
    t.merge(_xy_rows(spark), batch_id=0)
    t.cluster(by=["x", "y"])
    fx = len(t.scan_range("x", 0, 7).inputFiles())
    fy = len(t.scan_range("y", 0, 7).inputFiles())
    box = t.scan_box({"x": (0, 7), "y": (0, 7)})
    assert len(box.inputFiles()) <= min(fx, fy)
    want = sorted(
        f"url{i:05d}"
        for i in range(4096)
        if i % 64 <= 7 and (i * 2654435761) % 64 <= 7
    )
    assert sorted(r.url for r in box.collect()) == want
    with pytest.raises(ValueError, match="at least one"):
        t.scan_box({})


def test_scan_box_nonkey_on_mor_falls_back_soundly(spark, tmp_path):
    t = ParquetLakeTable(
        spark, str(tmp_path / "t"), key="url", n_buckets=1, mode="mor",
        stats_columns=("v",),
    )
    t.merge(mk(spark, [("a", 10), ("b", 20)]), batch_id=0)
    t.merge(mk(spark, [("a", 999)]), batch_id=1)  # delta moves 'a' out
    got = {(r.url, r.v) for r in t.scan_box({"v": (0, 100)}).collect()}
    assert got == {("b", 20)}


def test_as_of_timestamp_and_metadata_tables(spark, tmp_path):
    """read(as_of=ts) resolves to the last snapshot committed at or before
    ts; snapshots()/data_files() expose the control plane as DataFrames."""
    import time as _time

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1)]), batch_id=0)
    mid = _time.time()
    _time.sleep(0.05)
    t.merge(mk(spark, [("a", 2), ("b", 1)]), batch_id=1)

    assert _pdf(t.read(as_of=mid)).v.tolist() == [1]  # v0 content
    assert _pdf(t.read(as_of=_time.time())).v.tolist() == [2, 1]
    with pytest.raises(ValueError, match="predates"):
        t.read(as_of=mid - 10_000)
    with pytest.raises(ValueError, match="at most one"):
        t.read(version=0, as_of=mid)

    snaps = {r.version: r for r in t.snapshots().collect()}
    assert set(snaps) == {0, 1}
    assert snaps[1].parent == 0 and snaps[1].n_batches == 2
    assert snaps[0].committed_at <= mid <= snaps[1].committed_at

    m = t._manifest()
    live = sum(len(fl) for fl in m["buckets"].values())
    files = t.data_files().collect()
    assert len(files) == live
    assert all(r.kind == "base" and r.bytes > 0 for r in files)
    # key bounds recorded for every file (zone maps)
    assert all(r.key_min is not None and r.key_min <= r.key_max for r in files)


def test_key_bloom_filters_written_and_lookup_correct(spark, tmp_path):
    """key_bloom_ndv writes native parquet key blooms into every data
    file (observable as file-byte overhead vs the identical write without
    them) — the row-group point-lookup guard for z-ordered layouts whose
    files are no longer key-sorted. Lookup semantics unchanged."""
    import os as _os

    rows = _xy_rows(spark, 2048)
    plain = ParquetLakeTable(spark, str(tmp_path / "p"), key="url", n_buckets=1)
    bloom = ParquetLakeTable(
        spark, str(tmp_path / "b"), key="url", n_buckets=1, key_bloom_ndv=2048
    )
    plain.merge(rows, batch_id=0)
    bloom.merge(rows, batch_id=0)
    size = lambda t: sum(
        _os.path.getsize(f.replace("file:", "")) for f in t.read().inputFiles()
    )
    assert size(bloom) > size(plain) + 1000  # blooms occupy real bytes
    # clustered layout: key-sort gone, bloom still routes the point read
    bloom.cluster(by=["x", "y"], bits=4)
    assert {r.url for r in bloom.lookup("url00042").collect()} == {"url00042"}
    assert bloom.lookup("absent").count() == 0


def test_stale_handle_commit_preserves_stats_columns(spark, tmp_path):
    """A writer handle opened BEFORE a concurrent cluster() must not stamp
    its stale (shorter) stats_columns over the manifest on its next merge
    — the zone-map bounds the cluster rewrite recorded stay maintained."""
    p = str(tmp_path / "t")
    ingest = ParquetLakeTable(spark, p, key="url", n_buckets=1)  # no stats
    ingest.merge(_xy_rows(spark, 256), batch_id=0)
    maint = ParquetLakeTable(spark, p, key="url")
    maint.cluster(by=["x", "y"], bits=4)  # records x/y stats columns
    # the STALE handle commits next
    ingest.merge(
        spark.createDataFrame([("zzz", 1, 2)], "url string, x int, y int"),
        batch_id=1,
    )
    m = ingest._manifest()
    assert set(m["stats_columns"]) == {"x", "y"}
    # the new commit's files carry x/y bounds too
    new_files = [f for fl in m["buckets"].values() for f in fl]
    assert all(f in m["col_bounds"]["x"] for f in new_files)


def test_data_files_with_numeric_key(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.merge(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"),
        batch_id=0,
    )
    rows = t.data_files().collect()
    assert rows and all(r.key_min is not None for r in rows)


def test_export_snapshot_standalone_clone(spark, table, tmp_path):
    """export_snapshot produces a fully-functional table: read parity at
    the exported version, working lookup pruning, carried batch_ids
    (refire guard survives DR), and isolation from the source's future."""
    table.merge(mk(spark, [("a", 1), ("b", 1), ("c", 3)]), batch_id=0)
    table.merge(mk(spark, [("a", 2)]), batch_id=1)
    want = _pdf(table.read())

    dest = str(tmp_path / "backup")
    stats = table.export_snapshot(dest)
    assert stats["n_files"] >= 1 and stats["n_bytes"] > 0
    assert stats["version_exported"] == table.current_version()

    clone = ParquetLakeTable(spark, dest, key="url")
    assert _pdf(clone.read()).equals(want)
    assert clone.current_version() == 0
    # refire guard carried: batch 1 is already applied on the clone
    assert clone.merge(mk(spark, [("a", 999)]), batch_id=1) is False
    assert _pdf(clone.read()).equals(want)
    # key zone maps were rewritten to the copied paths: lookup works and
    # prunes (sanity: correct single-row answer through the pruned path)
    assert _pdf(clone.lookup("c")).v.tolist() == [3]
    # mutating the SOURCE after export must not leak into the clone
    table.merge(mk(spark, [("z", 9)]), batch_id=2)
    assert _pdf(clone.read()).equals(want)
    # the clone evolves independently (fresh history rooted at v0)
    clone.merge(mk(spark, [("d", 4)]), batch_id=100)
    assert "d" in _pdf(clone.read()).url.tolist()
    assert "d" not in _pdf(table.read()).url.tolist()


def test_export_snapshot_mor_with_deltas_and_older_version(spark, tmp_path):
    """MOR export: delta files ride along and resolve on the clone; an
    explicit older version exports that snapshot, not head."""
    t = ParquetLakeTable(spark, str(tmp_path / "mor"), key="url", n_buckets=2, mode="mor")
    t.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=0)
    v1 = t.current_version()
    t.merge(mk(spark, [("a", 5)]), batch_id=1)  # delta, not compacted
    t.merge(None, delete_keys=mk(spark, [("b",)], "url string"), batch_id=2)

    head = t.export_snapshot(str(tmp_path / "bk_head"))
    clone = ParquetLakeTable(spark, head["dest"], key="url")
    got = _pdf(clone.read())
    assert got.url.tolist() == ["a"] and got.v.tolist() == [5]

    old = t.export_snapshot(str(tmp_path / "bk_v1"), version=v1)
    clone_old = ParquetLakeTable(spark, old["dest"], key="url")
    assert _pdf(clone_old.read()).v.tolist() == [1, 1]


def test_incremental_index_mv_matches_recompute(spark, tmp_path):
    """maintain_index_mv: bootstrap the (token, doc_freq, term_freq)
    census at v1, fold changelog(v1) in, and it must equal a direct
    recompute over v2 exactly — updates cancel unchanged tokens, a token
    whose last doc is deleted drops out, repeated tokens count in
    term_freq but once in doc_freq."""
    from gnarly_spark.operators.mv import index_bootstrap, maintain_index_mv

    t = ParquetLakeTable(spark, str(tmp_path / "docs"), key="url", n_buckets=2)
    schema = "url string, text string"
    t.merge(
        spark.createDataFrame(
            [
                ("u1", "spark shuffles Spark merges"),
                ("u2", "lake merges"),
                ("u3", "rare gem"),
            ],
            schema,
        ),
        batch_id=0,
    )
    v1 = t.current_version()
    # u1 edited (drops 'merges', keeps both 'spark'), u3 deleted
    # (kills 'rare'/'gem'), u4 inserted
    t.merge(
        spark.createDataFrame(
            [("u1", "spark shuffles spark joins"), ("u4", "lake spark")],
            schema,
        ),
        delete_keys=spark.createDataFrame([("u3",)], "url string"),
        batch_id=1,
    )
    mv1 = index_bootstrap(t.read(v1))
    got = (
        maintain_index_mv(mv1, t.changelog(v1))
        .toPandas()
        .set_index("token")
        .sort_index()
    )
    want = index_bootstrap(t.read()).toPandas().set_index("token").sort_index()
    assert got.equals(want), (got, want)
    assert got.loc["spark"].doc_freq == 2  # u1, u4 — not 3 for u1's two
    assert got.loc["spark"].term_freq == 3
    assert "rare" not in got.index and "merges" in got.index
    assert got.loc["merges"].doc_freq == 1  # only u2 now


def test_purge_keys_erases_from_all_retained_versions(spark, table):
    """Hard delete: after purge, the key is gone from the CURRENT read,
    from every time-travel read, and from the change feed — while other
    rows, version numbers and the refire guard are untouched."""
    table.merge(mk(spark, [(f"u{i}", i) for i in range(12)]), batch_id=0)
    v1 = table.current_version()
    table.merge(mk(spark, [("u3", 333), ("u20", 20)]), batch_id=1)
    v2 = table.current_version()

    stats = table.purge_keys("u3")
    assert stats["rows_purged"] >= 2  # v1 copy + v2 copy
    assert stats["versions_rewritten"] >= 1

    # gone everywhere, including history
    assert table.read().where("url = 'u3'").count() == 0
    assert table.read(v1).where("url = 'u3'").count() == 0
    assert table.read(v2).where("url = 'u3'").count() == 0
    assert table.diff(v1).where("url = 'u3'").count() == 0
    # neighbors intact at both versions
    assert table.read(v1).count() == 11 and table.read().count() == 12
    assert _pdf(table.lookup("u2")).v.tolist() == [2]
    # refire guard survives the history rewrite
    assert table.applied_batch_ids() >= {0, 1}
    # a purged key can be re-inserted later (purge is not a tombstone)
    table.merge(mk(spark, [("u3", 999)]), batch_id=2)
    assert _pdf(table.lookup("u3")).v.tolist() == [999]


def test_purge_keys_mor_deltas_and_dropped_files(spark, tmp_path):
    """MOR mode: purged rows disappear from delta files too (including
    delete tombstones), and a delta file consisting ONLY of the key's
    rows is dropped from the manifests entirely."""
    t = ParquetLakeTable(
        spark, str(tmp_path / "m"), key="url", n_buckets=2, mode="mor"
    )
    t.merge(mk(spark, [(f"u{i}", i) for i in range(8)]), batch_id=0)
    v1 = t.current_version()
    t.merge(mk(spark, [("u5", 55)]), batch_id=1)  # delta holds only u5
    t.merge(
        mk(spark, [("u1", 11)]),
        delete_keys=spark.createDataFrame([("u5",)], "url string"),
        batch_id=2,
    )
    stats = t.purge_keys("u5")
    assert stats["files_dropped"] >= 1  # the u5-only delta file
    assert t.read().where("url = 'u5'").count() == 0
    assert t.read(v1).where("url = 'u5'").count() == 0
    # survivors resolve correctly through the remaining deltas
    assert _pdf(t.read()).set_index("url").v.loc["u1"] == 11
    assert t.read().count() == 7
    # physical check: no retained data file contains u5 anywhere
    for r in t.data_files().collect():
        assert spark.read.parquet(r.file).where("url = 'u5'").count() == 0


def test_purge_keys_after_rebucket_erases_old_layout_snapshots(spark, tmp_path):
    """Hard-delete must honor EVERY retained manifest's own bucket layout.

    A rebucket() inside the retention window leaves older manifests keyed
    by the old n_buckets; pruning them with HEAD's layout computes wrong
    bucket ids and silently skips files that still hold the purged key in
    historical snapshots — the key stays readable via time travel while
    purge reports success. Regression for the per-manifest bids_for fix."""
    from gnarly_spark.sinks.lake import bucket_of

    # pick a victim key whose bucket id DIFFERS between the layouts —
    # otherwise the head-layout pruning accidentally matches and the bug
    # stays hidden (pre-fix, this test fails only with such a key)
    keys = [(f"u{i}",) for i in range(16)]
    kdf = spark.createDataFrame(keys, "url string").select(
        "url",
        bucket_of(F.col("url"), 2).alias("b2"),
        bucket_of(F.col("url"), 8).alias("b8"),
    )
    victim = kdf.where("b2 <> b8").head().url

    t = ParquetLakeTable(spark, str(tmp_path / "rb"), key="url", n_buckets=2)
    t.merge(mk(spark, [(f"u{i}", i) for i in range(16)]), batch_id=0)
    v_old = t.current_version()  # old layout (2 buckets) holds the victim
    t.rebucket(8)
    t.merge(mk(spark, [(victim, 777), ("u99", 99)]), batch_id=1)
    v_new = t.current_version()

    stats = t.purge_keys(victim)
    # both the old-layout copy and the new-layout copy must be rewritten
    assert stats["rows_purged"] >= 2, stats
    for v in (v_old, v_new, None):
        assert (
            t.read(v).where(F.col("url") == victim).count() == 0
        ), f"{victim} visible at v={v}"
    # neighbors intact in the old snapshot, refire guard alive
    assert t.read(v_old).count() == 15
    assert _pdf(t.lookup("u99")).v.tolist() == [99]
    assert t.merge(mk(spark, [("u99", 1)]), batch_id=1) is False


def test_purge_keys_noop_and_empty(spark, table):
    table.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    assert table.purge_keys() == {
        "files_rewritten": 0,
        "files_dropped": 0,
        "rows_purged": 0,
        "versions_rewritten": 0,
    }
    stats = table.purge_keys("not-there")
    assert stats["rows_purged"] == 0 and stats["files_rewritten"] == 0
    assert table.read().count() == 2


def test_maintenance_job_purge_flag(spark, tmp_path, capsys):
    from jobs.maintenance_job import main

    t = ParquetLakeTable(spark, str(tmp_path / "p"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    t.merge(mk(spark, [("a", 11)]), batch_id=1)
    main(["--table", str(tmp_path / "p"), "--purge-keys", "a,zz", "--keep-last", "10"])
    import json as _json

    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["purge"]["rows_purged"] == 2  # both versions' copy of a
    t2 = ParquetLakeTable(spark, str(tmp_path / "p"), key="url")
    assert t2.read().where("url = 'a'").count() == 0
    assert sorted(_pdf(t2.read()).url) == ["b", "c"]


def test_purge_and_lookup_on_bigint_key_table(spark, tmp_path):
    """A non-string merge key must not break the point paths: lookup and
    purge_keys coerce key literals to the TABLE's key type before hashing
    (xxhash64('12345') != xxhash64(12345L) — the raw string would route to
    the wrong buckets and silently match nothing)."""
    t = ParquetLakeTable(spark, str(tmp_path / "ids"), key="doc_id", n_buckets=4)
    t.merge(
        mk(spark, [(i, i * 10) for i in range(8)], "doc_id bigint, v int"),
        batch_id=0,
    )
    # lookup with int AND string spellings of the key
    assert [r.v for r in t.lookup(3).collect()] == [30]
    assert [r.v for r in t.lookup("3").collect()] == [30]
    stats = t.purge_keys(5)
    assert stats["rows_purged"] == 1
    assert t.read().where("doc_id = 5").count() == 0
    assert t.read().count() == 7
    stats2 = t.purge_keys("6")  # string spelling purges too
    assert stats2["rows_purged"] == 1
    assert t.read().count() == 6
    with pytest.raises(ValueError, match="not castable"):
        t.purge_keys("not-a-number")


def test_expire_snapshots_keeps_parked_stage_files(spark, tmp_path):
    """A parked write-audit-publish stage must survive expire_snapshots
    even after later commits move the current version past the stage's
    data-dir version — read_staged() is the forensics contract."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [("a", 1)]), batch_id=0)
    tok = t.merge_staged(mk(spark, [("b", 2)]), batch_id=1)
    # later maintenance/commits move cur past the stage's dir version
    for i in range(2, 6):
        t.merge(mk(spark, [("a", i)]), batch_id=i)
    t.expire_snapshots(keep_last=2)
    staged = _pdf(t.read_staged(tok))
    assert staged.url.tolist() == ["a", "b"]


def test_expire_snapshots_spares_inflight_purge_output(spark, tmp_path):
    """purge_keys writes its rewritten files under a v{next}- prefixed dir
    so expire's in-flight guard protects the rewrite window; after the
    purge commits, every retained snapshot still reads (and an expire run
    right after deletes only the replaced originals)."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(mk(spark, [(f"u{i}", i) for i in range(6)]), batch_id=0)
    v1 = t.current_version()
    t.merge(mk(spark, [("u1", 111)]), batch_id=1)
    t.purge_keys("u2")
    t.expire_snapshots(keep_last=10)  # keeps all manifests; orphans only
    assert t.read().where("url = 'u2'").count() == 0
    assert t.read(v1).where("url = 'u2'").count() == 0
    assert t.read(v1).count() == 5 and t.read().count() == 5


def test_export_snapshot_same_basename_files_no_collision(spark, tmp_path):
    """Two purge runs leave files with identical basenames in one bucket;
    export must not let the copies collide (a bare-basename copy silently
    dropped one file's rows from the clone)."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=1,
                         files_per_bucket=2)
    t.merge(mk(spark, [(f"u{i}", i) for i in range(8)]), batch_id=0)
    t.purge_keys("u1")  # rewrites one of the bucket's two files
    t.purge_keys("u5")  # rewrites the other -> same purged-N basename
    names = {
        f.rsplit("/", 1)[-1]
        for fl in t._manifest()["buckets"].values()
        for f in fl
    }
    clone = str(tmp_path / "clone")
    t.export_snapshot(clone)
    c = ParquetLakeTable(spark, clone, key="url", n_buckets=1)
    assert sorted(r.url for r in c.read().collect()) == sorted(
        r.url for r in t.read().collect()
    )


def test_schema_evolution_leaves_untouched_buckets_in_place(spark, tmp_path):
    """An evolution commit (added column / int->bigint widening) must stay
    O(batch): buckets the merge didn't touch keep their EXACT old files in
    the new manifest (readers null-fill / scan-upcast them — no rewrite),
    and those old-schema files still read correctly under the new DDL."""
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=8)
    t.merge(mk(spark, [(f"u{i}", i) for i in range(32)]), batch_id=0)
    before = t._manifest()["buckets"]
    # one-row merge that BOTH widens v and adds a column
    t.merge(
        spark.createDataFrame(
            [("u0", 2**40, "en")], schema="url string, v bigint, lang string"
        ),
        batch_id=1,
    )
    after = t._manifest()["buckets"]
    from gnarly_spark.sinks.lake import bucket_of as _bo
    touched = str(
        spark.createDataFrame([("u0",)], "url string")
        .select(_bo(F.col("url"), 8).alias("b")).collect()[0].b
    )
    unchanged = [b for b in before if b != touched and before[b]]
    assert unchanged, "test needs untouched non-empty buckets"
    for b in unchanged:
        assert after[b] == before[b], f"bucket {b} was rewritten on evolution"
    got = _pdf(t.read())
    assert got.columns.tolist() == ["url", "v", "lang"]
    assert got[got.url == "u0"].v.tolist() == [2**40]
    assert got[got.url == "u5"].v.tolist() == [5]  # old int file, widened read
    assert got[got.url == "u5"].lang.tolist() == [None]


def test_lookup_on_timestamp_key_uses_normalized_bounds(spark, tmp_path):
    """Manifest bounds are _norm_stat strings; lookup must normalize its
    typed keys the same way before comparing (a timestamp-keyed lookup
    used to raise TypeError: '<=' between str and datetime)."""
    import datetime

    t = ParquetLakeTable(spark, str(tmp_path / "ts"), key="event_ts", n_buckets=2)
    rows = [
        (datetime.datetime(2026, 8, 19, 0, 0, i), f"v{i}") for i in range(6)
    ]
    t.merge(spark.createDataFrame(rows, "event_ts timestamp, v string"), batch_id=0)
    got = t.lookup("2026-08-19 00:00:03").collect()
    assert len(got) == 1 and got[0].v == "v3"


def test_restore_parent_is_previous_head(spark, table):
    """restore() is a forward commit: its manifest's parent must be the
    version it supersedes, not the restored snapshot's ancient parent —
    snapshots()/lineage() walk that chain."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)          # v0
    table.merge(mk(spark, [("a", 2)]), batch_id=1)          # v1
    table.merge(mk(spark, [("a", 3)]), batch_id=2)          # v2
    v = table.restore(0)                                     # v3
    lin = {e["version"]: e for e in table.lineage()}
    assert lin[v]["parent"] == 2, lin[v]


def test_iceberg_applied_batch_ids_empty_before_first_stamp(spark):
    """Fresh Iceberg table: no _batch_id column exists until the first
    stamped merge adds it — applied_batch_ids() must report 'none applied'
    instead of failing the very first merge on an unresolved column."""
    from gnarly_spark.sinks.lake import IcebergLakeTable

    t = object.__new__(IcebergLakeTable)
    t.spark, t.table, t.key = spark, "cat.db.fresh", "url"
    t.read = lambda: mk(spark, [("a", 1)])  # columns: url, v — no _batch_id
    assert t.applied_batch_ids() == set()


def test_append_reducer_read_before_first_batch(spark, tmp_path):
    """link_census_read before any micro-batch: an empty census, not
    PATH_NOT_FOUND."""
    from gnarly_spark.operators.graph import link_census_read, link_census_reducer
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    red = link_census_reducer()
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=[red])
    out = link_census_read(red, p)
    assert out.count() == 0
    assert out.columns == ["src_host", "dst_host", "n_links"]


def test_tags_pin_snapshots_and_read_by_name(spark, table):
    """Iceberg tags analog: named refs resolve in read(), pin their
    snapshot's manifest AND data files through expire_snapshots, and
    release on drop_tag."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    v0 = table.tag("golden")  # defaults to current version
    table.merge(mk(spark, [("a", 2)]), batch_id=1)
    table.merge(mk(spark, [("a", 3)]), batch_id=2)
    table.merge(mk(spark, [("a", 4)]), batch_id=3)

    assert v0 == 0
    assert _pdf(table.read(tag="golden")).v.tolist() == [1]
    tags = table.tags().toPandas()
    assert tags.name.tolist() == ["golden"] and tags.version.tolist() == [v0]

    # expiry would normally drop v0 (keep_last=2 of 4) — the tag pins it
    res = table.expire_snapshots(keep_last=2)
    assert v0 in res["kept"]
    assert _pdf(table.read(tag="golden")).v.tolist() == [1]
    assert _pdf(table.read(version=v0)).v.tolist() == [1]

    # re-point requires replace=True; bad names rejected
    with pytest.raises(ValueError, match="already exists"):
        table.tag("golden")
    table.tag("golden", version=table.current_version(), replace=True)
    assert _pdf(table.read(tag="golden")).v.tolist() == [4]
    with pytest.raises(ValueError, match="invalid tag name"):
        table.tag("../escape")
    with pytest.raises(ValueError, match="unknown tag"):
        table.read(tag="nope")
    with pytest.raises(ValueError, match="at most one"):
        table.read(version=0, tag="golden")

    # dropping the pin releases the snapshot to the next expiry
    assert table.drop_tag("golden") is True
    assert table.drop_tag("golden") is False
    res = table.expire_snapshots(keep_last=2)
    assert 0 not in res["kept"]
    with pytest.raises(FileNotFoundError):
        table.read(version=0)


def test_tag_of_expired_or_unknown_version_rejected(spark, table):
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    with pytest.raises(ValueError, match="not a retained snapshot"):
        table.tag("t", version=99)
    table.merge(mk(spark, [("a", 2)]), batch_id=1)
    table.merge(mk(spark, [("a", 3)]), batch_id=2)
    table.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not a retained snapshot"):
        table.tag("t", version=0)


# ---- writable branches ------------------------------------------------


def test_branch_isolation_and_fast_forward_publish(spark, table):
    """Branch commits are invisible on main until fast_forward; the
    published snapshot carries the branch's batch_ids so audited batches
    cannot refire on main (WAP across a commit chain)."""
    from gnarly_spark.sinks.lake import BranchDiverged

    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=1)
    b = table.create_branch("audit")
    assert b.ref == "audit" and table.ref == "main"
    b.merge(mk(spark, [("a", 2), ("c", 1)]), batch_id=2)
    b.merge(mk(spark, [("d", 1)]), batch_id=3)
    assert _pdf(table.read()).url.tolist() == ["a", "b"]  # main untouched
    got = _pdf(b.read())
    assert got.url.tolist() == ["a", "b", "c", "d"]
    assert got.v.tolist() == [2, 1, 1, 1]
    # branch refire guard holds before publish
    assert b.merge(mk(spark, [("x", 9)]), batch_id=2) is False
    v = table.fast_forward("audit")
    assert table.current_version() == v
    assert _pdf(table.read()).url.tolist() == ["a", "b", "c", "d"]
    assert table.applied_batch_ids() == {1, 2, 3}
    assert table.merge(mk(spark, [("y", 9)]), batch_id=3) is False
    # empty fast_forward (branch head == fork) is a no-op
    table.create_branch("empty")
    assert table.fast_forward("empty") == table.current_version()
    # re-running fast_forward on the already-published branch diverges
    # (main's head is the ADOPTED commit, not the branch's fork base)
    with pytest.raises(BranchDiverged):
        table.fast_forward("audit")


def test_branch_diverged_and_concurrent_ref_commits(spark, table):
    """Main committing after the fork blocks fast_forward; interleaved
    main/branch commits allocate distinct versions and neither chain sees
    the other's rows."""
    from gnarly_spark.sinks.lake import BranchDiverged

    table.merge(mk(spark, [("a", 1)]), batch_id=1)
    b = table.create_branch("side")
    b.merge(mk(spark, [("s1", 1)]), batch_id=2)
    table.merge(mk(spark, [("m1", 1)]), batch_id=3)
    b.merge(mk(spark, [("s2", 1)]), batch_id=4)
    table.merge(mk(spark, [("m2", 1)]), batch_id=5)
    assert _pdf(table.read()).url.tolist() == ["a", "m1", "m2"]
    assert _pdf(b.read()).url.tolist() == ["a", "s1", "s2"]
    snaps = {r.version: r.ref for r in table.snapshots().collect()}
    assert len(snaps) == len(set(snaps))  # distinct version numbers
    with pytest.raises(BranchDiverged):
        table.fast_forward("side")
    # maintenance stays main-only
    with pytest.raises(ValueError, match="main ref"):
        b.expire_snapshots()
    with pytest.raises(ValueError, match="main ref"):
        b.create_branch("nested")


def test_drop_branch_expire_reclaims_branch_only_files(spark, table):
    """After drop_branch, expire_snapshots removes the branch's manifests
    and ITS OWN data files while every file shared with kept main
    snapshots survives; a same-name branch recreated later never adopts
    the dead incarnation's commits (epoch guard)."""
    import os

    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=1)
    b = table.create_branch("tmp")
    b.merge(mk(spark, [("z", 1)]), batch_id=2)
    bh = b.current_version()
    branch_files = {
        r.file for r in b.data_files(bh).collect()
    } - {r.file for r in table.data_files().collect()}
    assert branch_files  # the branch wrote something of its own
    # while the ref is live, expire keeps every branch manifest + file
    table.merge(mk(spark, [("c", 1)]), batch_id=3)
    table.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for f in branch_files)
    assert _pdf(b.read()).url.tolist() == ["a", "b", "z"]
    assert table.drop_branch("tmp") is True
    table.expire_snapshots(keep_last=1)
    versions = {r.version for r in table.snapshots().collect()}
    assert bh not in versions  # branch manifest reclaimed
    assert _pdf(table.read()).url.tolist() == ["a", "b", "c"]  # main intact
    # recreated branch starts from main's head, not the dead chain
    b2 = table.create_branch("tmp")
    assert _pdf(b2.read()).url.tolist() == ["a", "b", "c"]
    assert table.drop_branch("gone-already") is False


def test_branch_mor_deltas_and_purge_reaches_branches(spark, tmp_path):
    """Branches work on MOR tables (delta chain per ref), and purge_keys'
    compliance guarantee covers branch snapshots: the key disappears from
    a live branch's read too."""
    t = ParquetLakeTable(spark, str(tmp_path / "m"), key="url", n_buckets=2, mode="mor")
    t.merge(mk(spark, [("a", 1), ("victim", 1)]), batch_id=1)
    b = t.create_branch("wip")
    b.merge(mk(spark, [("victim", 2), ("z", 1)]), batch_id=2)
    assert _pdf(b.read()).v.tolist() == [1, 2, 1]
    stats = t.purge_keys("victim")
    assert stats["rows_purged"] >= 2  # main copy + branch delta copy
    assert _pdf(t.read()).url.tolist() == ["a"]
    assert _pdf(b.read()).url.tolist() == ["a", "z"]


def test_branch_as_of_sees_prefork_history(spark, table):
    """A branch handle's AS OF resolves through its own commits AND the
    pre-fork main chain; main's AS OF never resolves to a branch commit."""
    import time as _time

    table.merge(mk(spark, [("a", 1)]), batch_id=1)
    _time.sleep(0.05)
    t_fork = _time.time()
    b = table.create_branch("hist")
    _time.sleep(0.05)
    b.merge(mk(spark, [("b", 1)]), batch_id=2)
    _time.sleep(0.05)
    # branch AS OF after its commit -> branch state
    assert _pdf(b.read(as_of=_time.time())).url.tolist() == ["a", "b"]
    # branch AS OF before the fork -> pre-fork main snapshot
    assert _pdf(b.read(as_of=t_fork)).url.tolist() == ["a"]
    # main AS OF now -> still only main history
    assert _pdf(table.read(as_of=_time.time())).url.tolist() == ["a"]


def test_orphan_report_dry_run(spark, table):
    """orphan_report lists exactly the files expire would reclaim — an
    expired-out version's unique files — without deleting anything, and
    marks files in never-committed (newer-than-head) dirs in_flight."""
    import os
    import shutil

    table.merge(mk(spark, [("a", 1), ("b", 1)]), batch_id=1)
    table.merge(mk(spark, [("a", 2)]), batch_id=2)
    assert table.orphan_report().count() == 0  # all files referenced
    # drop v0's manifest by expiring, but first copy one of its files
    # back after expire to fabricate a dangling file deterministically:
    v0_files = [r.file for r in table.data_files(0).collect()]
    stash = {f: f + ".stash" for f in v0_files}
    for f, s in stash.items():
        shutil.copy2(f, s)
    table.expire_snapshots(keep_last=1)
    restored = []
    for f, s in stash.items():
        if not os.path.exists(f):  # reclaimed by expire -> restore a copy
            os.replace(s, f)
            restored.append(f)
        else:
            os.remove(s)
    assert restored, "expire should have reclaimed v0-only files"
    rep = {r.file: r.status for r in table.orphan_report().collect()}
    assert set(restored) <= set(rep) and all(
        rep[f] == "orphan" for f in restored
    )
    # an uncommitted writer's dir (version beyond head) is flagged, not
    # treated as reclaimable
    head = table.current_version()
    d = os.path.join(table.path, "data", f"v{head + 7}-inflight")
    os.makedirs(d, exist_ok=True)
    shutil.copy2(restored[0], os.path.join(d, "part-0.parquet"))
    rep2 = {r.file: r.status for r in table.orphan_report().collect()}
    inflight = [f for f, s in rep2.items() if s == "in_flight"]
    assert len(inflight) == 1 and f"v{head + 7}-inflight" in inflight[0]
    # dry run: nothing was deleted
    assert all(os.path.exists(f) for f in rep2)


def test_merge_branch_three_way_publish_and_conflict(spark, table):
    """merge_branch publishes a DIVERGED branch when the two change sets
    touch disjoint keys (inserts/updates/deletes all propagate, main's
    own post-fork changes survive), stamps provenance, and refuses with
    the conflicting keys when both sides changed one."""
    from gnarly_spark.sinks.lake import BranchMergeConflict

    table.merge(mk(spark, [("a", 1), ("b", 1), ("c", 1), ("d", 1)]), batch_id=1)
    br = table.create_branch("side")
    # branch: update b, delete c, insert e
    br.merge(mk(spark, [("b", 20), ("e", 5)]), batch_id=2)
    br.merge(mk(spark, []), delete_keys=mk(spark, [("c", 0)]), batch_id=3)
    # main diverges on a DIFFERENT key
    table.merge(mk(spark, [("a", 10), ("f", 7)]), batch_id=4)
    v = table.merge_branch("side", batch_id=99)
    got = _pdf(table.read()).set_index("url").v.to_dict()
    assert got == {"a": 10, "b": 20, "d": 1, "e": 5, "f": 7}
    assert table.current_version() == v
    assert 99 in table.applied_batch_ids()
    m = table._manifest(v)
    assert m["merged_from"]["branch"] == "side"
    # refire-guarded publish
    assert table.merge(mk(spark, [("zz", 1)]), batch_id=99) is False

    # conflicting change: both sides touch the same key
    br2 = table.create_branch("clash")
    br2.merge(mk(spark, [("a", 100)]), batch_id=5)
    table.merge(mk(spark, [("a", 11)]), batch_id=6)
    with pytest.raises(BranchMergeConflict, match="a"):
        table.merge_branch("clash")

    # non-diverged branch falls through to fast_forward; empty branch no-op
    br3 = table.create_branch("ff")
    br3.merge(mk(spark, [("g", 1)]), batch_id=7)
    v2 = table.merge_branch("ff")
    assert _pdf(table.read()).set_index("url").v.to_dict()["g"] == 1
    assert table.current_version() == v2


def test_branch_schema_evolution_publishes_to_main(spark, table):
    """A branch that widens the schema mid-chain (added column) publishes
    the EVOLVED schema to main on fast_forward — the WAP pattern for
    risky schema changes: evolve on a branch, audit, publish."""
    table.merge(mk(spark, [("a", 1)]), batch_id=1)
    b = table.create_branch("evolve")
    b.merge(
        mk(spark, [("b", 2, "en")], schema="url string, v int, lang string"),
        batch_id=2,
    )
    # main is untouched AND unevolved
    assert set(table.read().columns) == {"url", "v"}
    assert set(b.read().columns) == {"url", "v", "lang"}
    table.fast_forward("evolve")
    got = _pdf(table.read())
    assert set(got.columns) == {"url", "v", "lang"}
    assert got.set_index("url").lang.to_dict() == {"a": None, "b": "en"}


def test_maintenance_job_branch_flags(spark, tmp_path, capsys):
    """The maintenance CLI drives the branch lifecycle: create -> (a
    writer commits on the branch) -> fast-forward -> drop."""
    import json as _json

    from jobs.maintenance_job import main

    t = ParquetLakeTable(spark, str(tmp_path / "b"), key="url")
    t.merge(mk(spark, [("a", 1)]), batch_id=1)
    main(["--table", str(tmp_path / "b"), "--create-branch", "wip",
          "--keep-last", "10"])
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["create_branch"] == "wip"
    t.branch_handle("wip").merge(mk(spark, [("z", 9)]), batch_id=2)
    main(["--table", str(tmp_path / "b"), "--fast-forward", "wip",
          "--drop-branch", "wip", "--keep-last", "10"])
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["fast_forward"]["branch"] == "wip" and out2["drop_branch"]
    assert _pdf(t.read()).url.tolist() == ["a", "z"]


def test_merge_rejects_null_keys_loud(spark, table, tmp_path):
    """Review r05: NULL merge keys must fail LOUD — the MOR read's
    groupBy collapses distinct null-key rows to one winner, and the COW
    anti-join never matches NULL = NULL (old null rows would duplicate
    on every merge). Both modes, both relations."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    with pytest.raises(Exception, match="NULL merge key"):
        table.merge(mk(spark, [(None, 9), ("b", 2)]), batch_id=1)
    with pytest.raises(Exception, match="NULL merge key"):
        table.merge(
            None,
            delete_keys=spark.createDataFrame([(None,)], "url string"),
            batch_id=2,
        )
    mor = ParquetLakeTable(
        spark, str(tmp_path / "mor"), key="url", n_buckets=2, mode="mor"
    )
    with pytest.raises(Exception, match="NULL merge key"):
        mor.merge(mk(spark, [(None, 1)]), batch_id=0)
    # and valid batches still merge fine after the rejections
    assert table.merge(mk(spark, [("b", 2)]), batch_id=3)
    assert table.read().count() == 2


def test_expire_keep_last_counts_main_commits_not_version_numbers(
    spark, table
):
    """Review r05: refs share ONE version-number space, so branch commits
    interleaved in the numbering must not eat the keep_last window —
    keep_last counts MAIN-CHAIN commits. main v0, branch v1-v2 (then
    dropped), main v3: keep_last=2 must keep v0 AND v3."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)  # main v0
    table.create_branch("dev")
    b = table.branch_handle("dev")
    b.merge(mk(spark, [("x", 10)]), batch_id=100)  # v1 (branch)
    b.merge(mk(spark, [("y", 11)]), batch_id=101)  # v2 (branch)
    table.drop_branch("dev")
    table.merge(mk(spark, [("a", 2)]), batch_id=1)  # main v3
    assert table.current_version() == 3
    table.expire_snapshots(keep_last=2)
    # v0 is main's immediately-previous snapshot: time travel must hold
    got = {r.url: r.v for r in table.read(version=0).collect()}
    assert got == {"a": 1}
    got = {r.url: r.v for r in table.read(version=3).collect()}
    assert got == {"a": 2}


def test_export_snapshot_clone_dirs_reclaimable(spark, table, tmp_path):
    """Review r05: the clone's data dirs carry a parseable v0- prefix, so
    the clone's OWN expire_snapshots can attribute and reclaim them once
    rewritten — unparseable names were skipped as in-flight forever (an
    unbounded disk leak for clones used as live tables)."""
    import os

    table.merge(mk(spark, [("a", 1), ("b", 2)]), batch_id=0)
    dest = str(tmp_path / "clone")
    table.export_snapshot(dest)
    clone = ParquetLakeTable(spark, dest, key="url")
    assert {r.url for r in clone.read().collect()} == {"a", "b"}
    for d in os.listdir(os.path.join(dest, "data")):
        # every clone data dir must parse as version 0
        assert int(d.split("-", 1)[0].lstrip("v")) == 0, d
    # rewrite everything, then expire: the exported originals must be
    # reclaimable (old files actually deleted)
    clone.merge(mk(spark, [("a", 10), ("b", 20)]), batch_id=1)
    r = clone.expire_snapshots(keep_last=1)
    assert r["deleted_files"] > 0, r
    assert {(x.url, x.v) for x in clone.read().collect()} == {("a", 10), ("b", 20)}


def test_merge_branch_provenance_on_its_own_commit(spark, table):
    """Review r05: merged_from must land on EXACTLY the commit the merge
    created (returned version), not on whatever the head resolves to
    afterwards."""
    table.merge(mk(spark, [("a", 1)]), batch_id=0)
    table.create_branch("f")
    b = table.branch_handle("f")
    b.merge(mk(spark, [("z", 9)]), batch_id=50)
    table.merge(mk(spark, [("c", 3)]), batch_id=1)  # diverge main
    v = table.merge_branch("f", batch_id=2)
    m = table._manifest(v)
    assert m["merged_from"]["branch"] == "f"
    assert {r.url for r in table.read().collect()} == {"a", "c", "z"}
