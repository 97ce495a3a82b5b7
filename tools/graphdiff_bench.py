"""Scale studies for the round-2 net-new operators.

A. Anti-entropy diff at 10M rows/side (operators/tablediff.py):
     1. naive row-level full-outer-join diff  — the baseline everyone
        writes; shuffles both corpora every run
     2. two-phase table_diff (B=4096)         — bucket checksums, then the
        row pass over mismatched buckets only (20 planted diffs)
     3. identical tables                       — phase 1 short-circuit: the
        steady-state nightly "verify the mirror" cost
B. Fixed-point PageRank (operators/graph.py) on a 2M-edge / 100k-host
   synthetic graph with a hot-target skew: total and per-round time for 5
   rounds (each round = one shuffle join + one partial-agg sum).

Run:  python tools/graphdiff_bench.py   (env SPARK_GRAFT_CPUS, default 32)
Fresh plans per timed leg (the AQE/localCheckpoint cache gotcha).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.operators.graph import pagerank
from gnarly_spark.operators.tablediff import _row_diff, table_diff
from gnarly_spark.session import get_spark

N = 10_000_000
N_EDGES = 2_000_000
N_HOSTS = 100_000


def sides(spark, diverge: bool):
    left = spark.range(N).select(
        F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias("url"),
        F.xxhash64("id").alias("v"),
        F.md5(F.col("id").cast("string")).alias("w"),
    )
    right = spark.range(N).select(
        F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias("url"),
        F.when(
            diverge & (F.col("id") % 500_000 == 7), F.lit(0).cast("bigint")
        )
        .otherwise(F.xxhash64("id"))
        .alias("v"),
        F.md5(F.col("id").cast("string")).alias("w"),
    )
    return left, right


def edges(spark):
    # hot-target skew: 25% of links point at 1k hub hosts
    h = F.xxhash64("id")
    return spark.range(N_EDGES).select(
        F.concat(
            F.lit("h"), F.pmod(h, F.lit(N_HOSTS)).cast("string")
        ).alias("src_host"),
        F.concat(
            F.lit("h"),
            F.when(F.col("id") % 4 == 0, F.pmod(h, F.lit(1000)))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_HOSTS)))
            .cast("string"),
        ).alias("dst_host"),
    ).where(F.col("src_host") != F.col("dst_host")).distinct()


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import shutil
    import tempfile

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="graphdiff_bench", cpus=cpus, shuffle_partitions=cpus)

    # --- A0: flat in-memory tables (no storage in play: measures pure
    # compute/shuffle; the naive join ties here because range() scans are
    # free — included for honesty) ---
    t_naive, n_naive = best_of(
        lambda: (
            lambda l, r: _row_diff(l, r, "url", ["v", "w"]).count()
        )(*sides(spark, True))
    )
    t_same, n_same = best_of(
        lambda: (
            lambda l, r: table_diff(l, r, "url", n_buckets=4096).count()
        )(*sides(spark, False))
    )
    print(
        f"A0 flat naive full-outer : {t_naive:6.2f}s  ({n_naive} diffs)\n"
        f"A0 flat identical phase1 : {t_same:6.2f}s  ({n_same} diffs)"
    )

    # --- A: disk-backed lake tables (the real deployment: the win is
    # phase 2 opening only mismatched buckets' FILES via the manifest) ---
    from gnarly_spark.operators.tablediff import lake_table_diff
    from gnarly_spark.sinks.lake import ParquetLakeTable

    work = tempfile.mkdtemp(prefix="gnarly_adiff_")
    try:
        left, _ = sides(spark, False)
        lt = ParquetLakeTable(spark, f"{work}/l", key="url", n_buckets=64)
        t0 = time.time()
        lt.merge(left, batch_id=0)
        t_build = time.time() - t0
        lt.export_snapshot(f"{work}/r")
        rt = ParquetLakeTable(spark, f"{work}/r", key="url")
        rt.merge(
            spark.createDataFrame(
                [(f"https://u/{i * 500_000 + 7}", 0, "x") for i in range(5)],
                "url string, v long, w string",
            ),
            batch_id=1,
        )
        n_files = len(lt.read().inputFiles()) + len(rt.read().inputFiles())

        def naive():
            return _row_diff(lt.read(), rt.read(), "url", ["v", "w"]).count()

        def fast():
            d = lake_table_diff(lt, rt)
            return d.count(), len(d.inputFiles())

        t_lnaive, _ = best_of(naive)
        t_lfast, (n_fast, files_fast) = best_of(fast)
        t_lsame_start = time.time()
        lake_table_diff(lt, lt).count()
        t_lsame = time.time() - t_lsame_start
        print(
            f"A lake build 10M x2     : {t_build:6.2f}s merge + snapshot clone\n"
            f"A lake naive full-outer : {t_lnaive:6.2f}s  (opens {n_files} files)\n"
            f"A lake two-phase        : {t_lfast:6.2f}s  ({n_fast} diffs; phase2"
            f" opened {files_fast}/{n_files} files)\n"
            f"A lake identical phase1 : {t_lsame:6.2f}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- B: pagerank ---
    e = edges(spark).localCheckpoint(eager=True)
    n_e = e.count()
    n_h = e.select("src_host").union(e.select("dst_host")).distinct().count()
    t0 = time.time()
    pr = pagerank(e, n_iter=5)
    top = pr.orderBy(F.desc("pr"), "host").limit(3).collect()
    t_pr = time.time() - t0
    print(
        f"B pagerank 5 rounds     : {t_pr:6.2f}s  ({n_e} edges, {n_h} hosts,"
        f" {t_pr / 5:.2f}s/round)  top={[(r.host, r.pr) for r in top]}"
    )


if __name__ == "__main__":
    main()
