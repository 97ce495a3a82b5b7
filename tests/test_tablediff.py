"""Anti-entropy diff: planted-divergence recall, identical-table
short-circuit, and manifest-level file pruning on the lake fast path."""

import pytest

from gnarly_spark.operators.tablediff import lake_table_diff, table_diff
from gnarly_spark.sinks.lake import ParquetLakeTable, bucket_of


def mk(spark, rows):
    return spark.createDataFrame(rows, schema="url string, v int, w string")


def test_table_diff_finds_planted_divergence(spark):
    base = [(f"u{i}", i, f"w{i}") for i in range(50)]
    left = mk(spark, base + [("left-only", 1, "x")])
    right_rows = [
        (u, v + 100, w) if u == "u7" else (u, v, "CHANGED" if u == "u9" else w)
        for u, v, w in base
    ]
    right = mk(spark, right_rows + [("right-only", 2, "y")])
    got = {
        (r.url, r.status) for r in table_diff(left, right, "url", n_buckets=8).collect()
    }
    assert got == {
        ("left-only", "only_left"),
        ("right-only", "only_right"),
        ("u7", "differs"),
        ("u9", "differs"),
    }


def test_table_diff_identical_short_circuits_empty(spark):
    df = mk(spark, [(f"u{i}", i, "w") for i in range(20)])
    out = table_diff(df, mk(spark, [(f"u{i}", i, "w") for i in range(20)]), "url")
    assert out.count() == 0
    assert out.columns == ["url", "status"]


def test_table_diff_empty_path_preserves_key_type(spark):
    """Identical-table short-circuit must return the key's REAL type —
    a numeric-keyed caller unioning empty and non-empty results would
    otherwise hit a bigint-vs-string mismatch depending on whether a diff
    was found."""
    same = spark.createDataFrame([(i, i * 2) for i in range(10)], "doc_id long, v int")
    empty = table_diff(same, same, "doc_id")
    assert empty.schema["doc_id"].dataType.simpleString() == "bigint"
    diverged = spark.createDataFrame(
        [(i, i * 2 + (1 if i == 3 else 0)) for i in range(10)], "doc_id long, v int"
    )
    nonempty = table_diff(same, diverged, "doc_id")
    # the two paths union cleanly (same schema) — the original bug
    both = empty.unionByName(nonempty)
    assert [(r.doc_id, r.status) for r in both.collect()] == [(3, "differs")]


def test_table_diff_compare_cols_subset(spark):
    """Diff restricted to v ignores a w-only divergence."""
    left = mk(spark, [("a", 1, "x"), ("b", 2, "y")])
    right = mk(spark, [("a", 1, "DIFFERENT"), ("b", 3, "y")])
    got = {
        (r.url, r.status)
        for r in table_diff(left, right, "url", compare_cols=["v"]).collect()
    }
    assert got == {("b", "differs")}


def test_table_diff_missing_column_raises(spark):
    left = mk(spark, [("a", 1, "x")])
    right = spark.createDataFrame([("a", 1)], "url string, v int")
    with pytest.raises(ValueError, match="lacks columns"):
        table_diff(left, right, "url")


def test_lake_table_diff_prunes_to_mismatched_bucket_files(spark, tmp_path):
    """Same bucket layout both sides: after diverging ONE key, phase 2 must
    open only that key's bucket files on each table — not the snapshots."""
    lt = ParquetLakeTable(spark, str(tmp_path / "l"), key="url", n_buckets=4)
    rt = ParquetLakeTable(spark, str(tmp_path / "r"), key="url", n_buckets=4)
    rows = mk(spark, [(f"u{i}", i, f"w{i}") for i in range(40)])
    lt.merge(rows, batch_id=0)
    rt.merge(rows, batch_id=0)

    assert lake_table_diff(lt, rt).count() == 0

    rt.merge(mk(spark, [("u13", 999, "w13")]), batch_id=1)
    diff = lake_table_diff(lt, rt)
    assert [(r.url, r.status) for r in diff.collect()] == [("u13", "differs")]

    # file pruning: the phase-2 relation reads exactly the files of u13's
    # bucket in each table (data_files() records bucket per file)
    from pyspark.sql import functions as F

    bad = spark.range(1).select(bucket_of(F.lit("u13"), 4).alias("b")).collect()[0].b
    want = set()
    for t in (lt, rt):
        want |= {
            r.file for r in t.data_files().collect() if int(r.bucket) == bad
        }
    got_files = {
        "/" + f.removeprefix("file:").lstrip("/") for f in diff.inputFiles()
    }
    assert got_files == want


def test_lake_table_diff_layout_mismatch_falls_back(spark, tmp_path):
    lt = ParquetLakeTable(spark, str(tmp_path / "l"), key="url", n_buckets=2)
    rt = ParquetLakeTable(spark, str(tmp_path / "r"), key="url", n_buckets=8)
    rows = mk(spark, [(f"u{i}", i, "w") for i in range(10)])
    lt.merge(rows, batch_id=0)
    rt.merge(rows, batch_id=0)
    rt.merge(mk(spark, [("u3", -1, "w")]), batch_id=1)
    got = [(r.url, r.status) for r in lake_table_diff(lt, rt).collect()]
    assert got == [("u3", "differs")]


def test_lake_table_diff_key_mismatch_raises(spark, tmp_path):
    lt = ParquetLakeTable(spark, str(tmp_path / "l"), key="url")
    rt = ParquetLakeTable(spark, str(tmp_path / "r"), key="other")
    with pytest.raises(ValueError, match="merge keys differ"):
        lake_table_diff(lt, rt)


def test_row_hash_detects_null_column_swap(spark):
    """A value shifting into an adjacent nullable column must register as
    'differs': a flat xxhash64(key, a, b) skips NULL args, so (a=NULL,
    b='x') and (a='x', b=NULL) used to collide — the anti-entropy tool's
    core purpose defeated. Per-column inner hashes pin every column to a
    fixed position."""
    schema = "k long, a string, b string"
    left = spark.createDataFrame([(1, None, "x"), (2, "y", "z")], schema)
    right = spark.createDataFrame([(1, "x", None), (2, "y", "z")], schema)
    got = {(r.k, r.status) for r in table_diff(left, right, "k", n_buckets=4).collect()}
    assert got == {(1, "differs")}


def test_compare_cols_empty_is_keys_only_existence_diff(spark):
    """compare_cols=[] means 'reconcile key sets only': value changes are
    ignored, and the right side may lack the left's payload columns
    entirely (it was previously treated as falsy and expanded to every
    non-key column)."""
    left = spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int")
    right = spark.createDataFrame(
        [("a", "ignored"), ("c", "new")], "url string, other string"
    )
    got = {
        (r.url, r.status)
        for r in table_diff(left, right, "url", n_buckets=4, compare_cols=[]).collect()
    }
    assert got == {("b", "only_left"), ("c", "only_right")}
