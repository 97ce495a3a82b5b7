"""Count-min sketch: one-sided error, mergeability, probe semantics, plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnarly_spark.functions.sketches import cms_build, cms_estimate, cms_merge


def _zipfish(spark):
    # skewed keys: key k appears ~ (4000 / (k+1)) times, 200 distinct
    return spark.range(200).select(
        F.explode(
            F.sequence(F.lit(1), (F.lit(4000) / (F.col("id") + 1)).cast("int"))
        ).alias("_i"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
    )


def test_cms_never_undercounts_and_is_tight_on_heavy_keys(spark):
    df = _zipfish(spark)
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    est = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(
            cms_build(df, "k", d=4, w=64), df.select("k").distinct(), "k", d=4, w=64
        ).collect()
    }
    n = sum(exact.values())
    for k, ex in exact.items():
        assert est[k] >= ex, (k, est[k], ex)  # one-sided by construction
        assert est[k] - ex <= 4 * n / 64, (k, est[k], ex)  # way inside 2N/w w.h.p.


def test_cms_merge_equals_whole_stream_sketch(spark):
    df = _zipfish(spark).withColumn("part", (F.col("_i") % 3).cast("string"))
    per_part = cms_build(df, "k", d=4, w=64, group_cols=("part",))
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_merge(per_part.drop("part")).collect()
    }
    whole = {
        (r["row"], r["col"]): r["cnt"] for r in cms_build(df, "k", d=4, w=64).collect()
    }
    assert merged == whole  # counter addition is lossless


def test_cms_unseen_key_estimates_from_collisions_only(spark):
    df = _zipfish(spark)
    probe = spark.createDataFrame([("never-seen-key-xyz",)], "k string")
    est = cms_estimate(cms_build(df, "k", d=4, w=64), probe, "k", d=4, w=64).collect()
    # an unseen key reads whatever collided into its cells: >= 0, and far
    # below the heavy keys (min over 4 independent rows)
    assert est[0]["cms_count"] >= 0
    assert est[0]["cms_count"] <= 4 * df.count() / 64


def test_cms_build_partial_aggregates_before_shuffle(spark):
    plan = (
        cms_build(_zipfish(spark), "k", d=4, w=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan  # shuffle carries <= d*w counters/partition


def test_cms_estimate_drops_null_probe_keys(spark):
    """NULL probe keys (outer-join residue) used to hash as the bare salt
    string and report an arbitrary collision count — the build side drops
    NULL keys, so estimates must exclude them too."""
    df = _zipfish(spark)
    probe = spark.createDataFrame([("k0",), (None,)], "k string")
    est = cms_estimate(cms_build(df, "k", d=4, w=64), probe, "k", d=4, w=64).toPandas()
    assert est.k.notna().all() and len(est) == 1
