"""HyperLogLog sketch: accuracy, mergeability, DuckDB portability, plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gnarly_spark.functions.sketches import (
    hll_add,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_oracle_sql,
)


@pytest.fixture(scope="module")
def keys_50k(spark):
    # 60k rows over 50k distinct keys (10k keys appear twice) — large enough
    # to leave the linear-counting regime at p=9 (2.5 * 512 = 1280)
    return spark.range(60000).select(
        (F.col("id") % 50000).alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_hll_estimator_branch_accuracy(spark, keys_50k):
    est = hll_distinct(keys_50k, "k", (), p=9).collect()[0]["hll_distinct"]
    # p=9 standard error = 1.04/sqrt(512) ~ 4.6%; 3 sigma ~ 14%
    assert abs(est - 50000) / 50000 < 0.14, est


def test_hll_merge_equals_direct_exactly(spark, keys_50k):
    per_grp = hll_add(keys_50k, "k", ("grp",), p=9)
    merged = hll_estimate(hll_merge(per_grp), (), p=9).collect()[0]["hll_distinct"]
    direct = hll_distinct(keys_50k, "k", (), p=9).collect()[0]["hll_distinct"]
    assert merged == direct  # register max is lossless, not approximately equal


def test_hll_matches_duckdb_oracle_bit_for_bit(spark, keys_50k):
    spark_rows = {
        r["grp"]: r["hll_distinct"]
        for r in hll_distinct(keys_50k, "k", ("grp",), p=9).collect()
    }
    sql = hll_oracle_sql(
        "SELECT CAST(range % 50000 AS BIGINT) AS k, "
        "CAST(range % 4 AS VARCHAR) AS grp FROM range(60000)",
        "k",
        ("grp",),
        p=9,
    )
    duck_rows = {g: v for g, v in duckdb.sql(sql).fetchall()}
    assert spark_rows == duck_rows


def test_hll_null_keys_ignored(spark):
    df = spark.range(100).select(
        F.when(F.col("id") < 50, F.col("id")).alias("k")
    )
    est = hll_distinct(df, "k", (), p=9).collect()[0]["hll_distinct"]
    # 50 non-null distinct keys, linear-counting regime: close to exact
    assert abs(est - 50) < 5, est


def test_hll_add_is_partial_aggregation_no_explode(spark, keys_50k):
    plan = hll_add(keys_50k, "k", ("grp",), p=9)._jdf.queryExecution().executedPlan().toString()
    # the register table partial-aggregates map-side: the shuffle carries at
    # most m register rows per (input partition, group), never raw keys
    assert "partial_max" in plan
    assert "Generate" not in plan  # no explode anywhere in the sketch path


# ---------------------------------------------------------------------------
# bottom-k sketch
# ---------------------------------------------------------------------------


def test_bottomk_merge_of_partials_equals_whole(spark):
    """Sketches built over arbitrary slices merge EXACTLY to the whole-data
    sketch — the property that makes per-day/per-partition rollups sound."""
    from gnarly_spark.functions.sketches import bottomk_merge, bottomk_sketch

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 3).alias("v")
    )
    whole = bottomk_sketch(df, "id", "v", ("g",), k=16)
    parts = [
        bottomk_sketch(df.where(F.col("id") % 3 == i), "id", "v", ("g",), k=16)
        for i in range(3)
    ]
    merged = bottomk_merge(parts[0].union(parts[1]).union(parts[2]), 16, ("g",))
    got = {r["g"]: r["sketch"] for r in merged.collect()}
    want = {r["g"]: r["sketch"] for r in whole.collect()}
    assert got == want


def test_bottomk_ungrouped_is_partition_parallel_and_exact(spark):
    """group_cols=() must NOT funnel the whole input through one window
    partition: it pre-reduces bottom-k per input partition then merges the
    tiny partials (exact by the merge rule). Result equals a constant-group
    sketch; the plan's big window is keyed by the partition id."""
    from gnarly_spark.functions.sketches import bottomk_sketch

    df = spark.range(4000).repartition(8).select(
        F.col("id"), (F.col("id") * 7 % 1001).alias("v")
    )
    got = bottomk_sketch(df, "id", "v", (), k=32)
    want = bottomk_sketch(
        df.withColumn("_g", F.lit(1)), "id", "v", ("_g",), k=32
    ).drop("_g")
    assert got.select("sketch").collect() == want.select("sketch").collect()
    # the full-input window runs per input partition, not SinglePartition
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan, plan


def test_bottomk_quantile_accuracy_and_small_group(spark):
    from gnarly_spark.functions.sketches import bottomk_quantiles, bottomk_sketch

    df = spark.range(5000).select(
        F.col("id"), F.lit("a").alias("g"), F.col("id").alias("v")
    )
    small = spark.range(5).select(
        (F.col("id") + 10000).alias("id"), F.lit("b").alias("g"),
        F.col("id").alias("v"),
    )
    sk = bottomk_sketch(df.union(small), "id", "v", ("g",), k=256)
    est = {r["g"]: r for r in bottomk_quantiles(sk, (0.5,)).collect()}
    # ~1/sqrt(k) sampling bound, generous factor
    assert abs(est["a"]["est_p50"] - 2500) <= 4 / (256**0.5) * 5000
    # group smaller than k: the sample IS the group -> exact median
    assert est["b"]["n_sample"] == 5 and est["b"]["est_p50"] == 2


def test_kmv_jaccard_exact_when_k_covers_union(spark):
    """|A ∪ B| <= k: the sketch IS the set, so the estimate equals the
    true Jaccard exactly."""
    from gnarly_spark.functions.sketches import kmv_jaccard

    a = spark.createDataFrame([(f"u{i}",) for i in range(30)], "id string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(20, 50)], "id string")
    r = kmv_jaccard(a, b, "id", k=256).collect()[0]
    assert r.k_union == 50 and r.n_both == 10
    assert r.jaccard_est == 10 / 50  # true J = |20..29| / |0..49|


def test_kmv_jaccard_matches_python_replay_when_sketched(spark):
    """k < |union|: replay the estimator in pure Python over hashlib.md5
    — deterministic, engine-portable (duplicates must not bias it)."""
    import hashlib

    from gnarly_spark.functions.sketches import kmv_jaccard

    A = [f"a{i}" for i in range(300)] + [f"c{i}" for i in range(200)]
    B = [f"b{i}" for i in range(300)] + [f"c{i}" for i in range(200)]
    k = 64
    a = spark.createDataFrame([(x,) for x in A * 3], "id string")  # dups
    b = spark.createDataFrame([(x,) for x in B], "id string")
    r = kmv_jaccard(a, b, "id", k=k).collect()[0]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    ka = sorted(md5(x) for x in set(A))[:k]
    kb = sorted(md5(x) for x in set(B))[:k]
    ku = sorted(set(ka) | set(kb))[:k]
    n_both = sum(1 for h in ku if h in set(ka) and h in set(kb))
    assert r.k_union == len(ku) == k
    assert r.n_both == n_both
    assert r.jaccard_est == n_both / k
    # and the estimate lands near the true J = 200/800
    assert abs(r.jaccard_est - 0.25) < 0.12


def test_kmv_null_ids_and_empty_inputs(spark):
    """NULL ids must not claim sketch slots (disjoint sets with NULLs
    would fake overlap); empty inputs return J=0, not DIVIDE_BY_ZERO."""
    from gnarly_spark.functions.sketches import kmv_jaccard

    a = spark.createDataFrame([("a1",), (None,)], "id string")
    b = spark.createDataFrame([("b1",), (None,)], "id string")
    r = kmv_jaccard(a, b, "id", k=4).collect()[0]
    assert r.n_both == 0 and r.jaccard_est == 0.0  # truly disjoint
    e = spark.createDataFrame([], "id string")
    r2 = kmv_jaccard(e, e, "id", k=4).collect()[0]
    assert r2.k_union == 0 and r2.jaccard_est == 0.0
