"""Round-3 web/curation operators at 100x the sf0.1 driver scale:
1M synthetic docs / 3M crawl pages, all inputs built with JVM exprs.

What it measures (fresh plan per timed run, best of N):
  1. dsir_weights       — 1M docs x ~40 tokens (hashed-bigram stats +
                          broadcast lam + groupBy(id))
  2. anchor_text_census — 3M pages x ~3 anchors (regexp explode +
                          two-level agg)
  3. robots_filter      — 10M urls vs 50k hosts / ~67k directives
                          (broadcast arrays, map-only verdict)
  4. registrable_domain — 10M hosts (regexp + InSet suffix resolution)

Run:  SPARK_GRAFT_CPUS=32 python tools/web_ops_bench.py
      (PYTHONPATH=/root/repo when nohup'd — CLAUDE.md gotcha)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.session import get_spark

N_DOCS = 1_000_000
N_PAGES = 3_000_000
N_URLS = 10_000_000
N_HOSTS = 50_000


def docs(spark):
    """~40-token docs over a 5k-word vocab; every 10th doc 'target'."""
    i = F.col("id")
    word = lambda k: F.concat(  # noqa: E731
        F.lit("w"), ((i * k + k * k) % 5_000).cast("string")
    )
    text = F.concat_ws(" ", *[word(k) for k in range(1, 41)])
    return spark.range(N_DOCS).select(
        i.alias("doc_id"),
        text.alias("text"),
        (i % 10 == 0).alias("tgt"),
    )


def pages(spark):
    i = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    a = lambda k: F.concat(  # noqa: E731
        F.lit('<a href="https://h'),
        s((i * k) % 20_000),
        F.lit(".example/p/"),
        s((i * k) % 500_000),
        F.lit('">anchor '),
        s((i * k) % 97),
        F.lit("</a>"),
    )
    html = F.concat(F.lit("<p>x</p>"), a(1), a(3), a(7))
    return spark.range(N_PAGES).select(html.alias("html"))


def urls(spark):
    i = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    path = (
        F.when(i % 3 == 0, F.concat(F.lit("/p/"), s(i % 9_999)))
        .when(i % 3 == 1, F.concat(F.lit("/admin/x"), s(i % 7)))
        .otherwise(F.lit("/admin/pub/y"))
    )
    return spark.range(N_URLS).select(
        F.concat(
            F.lit("https://h"), s(i % N_HOSTS), F.lit(".example"), path
        ).alias("url")
    )


def rules(spark):
    i = F.col("id")
    host = F.concat(F.lit("h"), i.cast("string"), F.lit(".example"))
    r1 = spark.range(N_HOSTS).select(
        host.alias("host"), F.lit("/admin").alias("prefix"),
        F.lit(False).alias("allow"),
    )
    r2 = (
        spark.range(N_HOSTS)
        .where(i % 3 == 0)
        .select(host.alias("host"), F.lit("/admin/pub").alias("prefix"),
                F.lit(True).alias("allow"))
    )
    return r1.unionByName(r2)


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="web_ops_bench", cpus=cpus, shuffle_partitions=cpus
    )

    from gnarly_spark.functions.text import dsir_weights
    from gnarly_spark.functions.url import registrable_domain, robots_filter
    from gnarly_spark.operators.graph import anchor_text_census

    def run_dsir():
        out = dsir_weights(docs(spark), F.col("tgt"))
        out.agg(F.sum("dsir_logw"), F.sum("n_grams")).collect()

    def run_anchor():
        out = anchor_text_census(pages(spark))
        out.agg(F.sum("n_mentions"), F.count(F.lit(1))).collect()

    def run_robots():
        out = robots_filter(urls(spark), rules(spark))
        out.agg(F.sum(F.col("allowed").cast("long"))).collect()

    def run_domain():
        from gnarly_spark.operators.graph import host_of

        out = urls(spark).select(
            registrable_domain(host_of(F.col("url"))).alias("d")
        )
        out.groupBy("d").count().agg(F.count(F.lit(1))).collect()

    for name, fn, denom in (
        ("dsir_weights_1M_docs", run_dsir, N_DOCS),
        ("anchor_census_3M_pages", run_anchor, N_PAGES),
        ("robots_filter_10M_urls", run_robots, N_URLS),
        ("registrable_domain_10M", run_domain, N_URLS),
    ):
        t = best_of(fn)
        print(f"{name}: {t:.2f}s = {denom / t / 1e6:.2f}M rows/s "
              f"(cpus={cpus})", flush=True)


if __name__ == "__main__":
    main()
