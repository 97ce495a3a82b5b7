"""Compliance hard-delete cost study: purge_keys on a 10M-row lake table.

What it measures: build a 64-bucket / 10M-row table with 3 commits of
history (so the purge has several retained versions to rewrite), then
purge 3 keys and report wall time, files rewritten vs total, and rows
purged. The claim under test: purge cost is O(affected files) — bucket
routing + zone maps confine the rewrite to the keys' buckets, not the
corpus — so the op is a routine maintenance job, not an outage.

Run:  python tools/purge_bench.py   (env SPARK_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.session import get_spark
from gnarly_spark.sinks.lake import ParquetLakeTable

N = 10_000_000


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="purge_bench", cpus=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="gnarly_purge_")
    try:
        t = ParquetLakeTable(spark, f"{work}/t", key="url", n_buckets=64)
        rows = spark.range(N).select(
            F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias("url"),
            F.xxhash64("id").alias("v"),
            F.md5(F.col("id").cast("string")).alias("w"),
        )
        t0 = time.time()
        t.merge(rows, batch_id=0)
        # two more commits so history rewrite has work to do
        t.merge(
            spark.createDataFrame(
                [(f"https://u/{i}", -1, "x") for i in (7, 77, 777)],
                "url string, v long, w string",
            ),
            batch_id=1,
        )
        t.merge(
            spark.createDataFrame(
                [(f"https://u/{i}", -2, "y") for i in (7, 8888)],
                "url string, v long, w string",
            ),
            batch_id=2,
        )
        t_build = time.time() - t0
        n_files = t.data_files().count()
        t0 = time.time()
        stats = t.purge_keys("https://u/7", "https://u/77", "https://u/8888")
        t_purge = time.time() - t0
        ok = t.read().where(
            F.col("url").isin("https://u/7", "https://u/77", "https://u/8888")
        ).count()
        print(
            f"build 10M x 3 commits : {t_build:6.2f}s  ({n_files} live files)\n"
            f"purge 3 keys          : {t_purge:6.2f}s  {stats}\n"
            f"post-purge residue    : {ok} rows (must be 0);"
            f" table rows {t.read().count()}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
