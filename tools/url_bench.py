"""URL canonicalization throughput: 10M messy urls, map-only.

What it measures (fresh plans per leg, best of N):
  1. canonicalize 10M urls -> count(distinct-free agg)  — pure map cost
  2. canonical-census groupBy (the web_url_canonicalize shape at 10M)
The op is all JVM regexp/split/sort inside one codegen stage, so its 8->32
scaling should track the box's measured pure-CPU ceiling (~0.435-0.55 —
CLAUDE.md), NOT the disk ceiling; a miss means Python or a shuffle snuck in.

Run:  SPARK_GRAFT_CPUS=8 python tools/url_bench.py
      SPARK_GRAFT_CPUS=32 python tools/url_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.functions.url import canonicalize_url
from gnarly_spark.session import get_spark

N = 10_000_000


def data(spark):
    # deterministic messy spellings (JVM exprs): host of 100k, page of 1M,
    # variant of 6 — same shapes as the driver query's 7-way CASE
    i = F.col("id")
    host = (i % 100_000).cast("string")
    page = (i % 1_000_000).cast("string")
    v = i % 6
    url = (
        F.when(v == 0, F.concat(F.lit("HTTPS://H"), host, F.lit(".Example.com/p/"), page))
        .when(v == 1, F.concat(F.lit("https://h"), host, F.lit(".example.com:443/p/"), page))
        .when(v == 2, F.concat(F.lit("https://h"), host, F.lit(".example.com/p/"), page, F.lit("#s")))
        .when(v == 3, F.concat(F.lit("https://h"), host, F.lit(".example.com/p/"), page, F.lit("/?utm_source=f&b=2&a=1")))
        .when(v == 4, F.concat(F.lit("https://h"), host, F.lit(".example.com/p/"), page, F.lit("/")))
        .otherwise(F.concat(F.lit("https://h"), host, F.lit(".example.com/p/"), page, F.lit("?b=2&a=1")))
    )
    return spark.range(N).select(url.alias("raw_url"))


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="url_bench", cpus=cpus, shuffle_partitions=cpus)

    def map_only():
        # agg over the canonical string defeats dead-code elim without a shuffle
        data(spark).select(
            canonicalize_url(F.col("raw_url")).alias("c")
        ).agg(F.sum(F.length("c"))).collect()

    def census():
        data(spark).select(
            canonicalize_url(F.col("raw_url")).alias("c")
        ).groupBy("c").count().agg(F.count("*"), F.sum("count")).collect()

    t_map = best_of(map_only)
    t_census = best_of(census)
    print(
        f"cpus={cpus} map_only={t_map:.2f}s ({N / t_map / 1e6:.2f}M urls/s) "
        f"census={t_census:.2f}s ({N / t_census / 1e6:.2f}M urls/s)"
    )


if __name__ == "__main__":
    main()
