"""Sketch-vs-exact study: HLL distinct and CMS heavy hitters at 10M rows.

What it measures (fresh plans per leg, best of N):
  1. exact per-group COUNT(DISTINCT key)   — shuffles every distinct key
  2. HLL p=12 per-group estimate           — shuffles <= 4096 register rows
     per (map partition, group)
  3. exact global top-20 keys              — full key groupBy
  4. CMS d=4 w=4096 build + top-20 probe   — bounded d*w counter shuffle
plus the HLL relative errors, so the accuracy being bought is visible.

Run:  python tools/sketch_bench.py  (env SPARK_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    hll_distinct,
)
from gnarly_spark.session import get_spark

N = 10_000_000
P = 12  # 4096 registers; stderr ~1.6%
D, W = 4, 4096


def data(spark):
    # ~3.3M distinct keys over 10M rows, zipf-ish tail via modular squash,
    # 8 groups; deterministic (pure column exprs, JVM-side)
    return spark.range(N).select(
        (F.xxhash64("id") % 3_300_000).alias("k"),
        (F.col("id") % 8).cast("string").alias("g"),
    )


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def shuffle_written(spark):
    """Total shuffle bytes/records written by completed stages so far —
    the metric the sketch actually buys (localhost wall time can't see
    network shuffle cost)."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = _json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def measured(spark, fn):
    b0, r0 = shuffle_written(spark)
    fn()
    b1, r1 = shuffle_written(spark)
    return b1 - b0, r1 - r0


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # UI on: the study reads stage shuffle metrics from the REST endpoint
    spark = get_spark(
        app_name="sketch_bench",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )

    t_exact = best_of(
        lambda: data(spark)
        .groupBy("g")
        .agg(F.countDistinct("k").alias("d"))
        .collect()
    )
    t_hll = best_of(lambda: hll_distinct(data(spark), "k", ("g",), p=P).collect())

    exact = {
        r["g"]: r["d"]
        for r in data(spark).groupBy("g").agg(F.countDistinct("k").alias("d")).collect()
    }
    est = {
        r["g"]: r["hll_distinct"]
        for r in hll_distinct(data(spark), "k", ("g",), p=P).collect()
    }
    errs = sorted(abs(est[g] - exact[g]) / exact[g] * 100 for g in exact)

    def topk_exact():
        return (
            data(spark)
            .groupBy("k")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "k")
            .limit(20)
            .collect()
        )

    t_top_exact = best_of(topk_exact)
    probe_keys = [r["k"] for r in topk_exact()]

    def cms_probe():
        d = data(spark)
        sk = cms_build(d, "k", d=D, w=W)
        probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
        return cms_estimate(sk, probe, "k", d=D, w=W).collect()

    t_cms = best_of(cms_probe)

    sb_exact, sr_exact = measured(
        spark,
        lambda: data(spark).groupBy("g").agg(F.countDistinct("k")).collect(),
    )
    sb_hll, sr_hll = measured(
        spark, lambda: hll_distinct(data(spark), "k", ("g",), p=P).collect()
    )
    sb_top, sr_top = measured(spark, topk_exact)
    sb_cms, sr_cms = measured(spark, cms_probe)

    print(f"rows={N} cpus={cpus} groups=8 distinct~3.3M")
    print(f"exact countDistinct per group : {t_exact:.2f}s  shuffle {sb_exact/1e6:.1f} MB / {sr_exact:,} rows")
    print(f"HLL p={P} per group           : {t_hll:.2f}s  shuffle {sb_hll/1e6:.1f} MB / {sr_hll:,} rows")
    print(f"HLL rel-err % (min/med/max)   : {errs[0]:.2f} / {errs[len(errs)//2]:.2f} / {errs[-1]:.2f}")
    print(f"exact global top-20           : {t_top_exact:.2f}s  shuffle {sb_top/1e6:.1f} MB / {sr_top:,} rows")
    print(f"CMS d={D} w={W} build+probe   : {t_cms:.2f}s  shuffle {sb_cms/1e6:.1f} MB / {sr_cms:,} rows")


if __name__ == "__main__":
    main()
