"""Deletion-vector cost study: predicate delete on a 10M-row lake table —
DV (delete_where) vs the COW alternative (merge(delete_keys=...) which
rewrites every touched bucket) — plus the read-side cost of carrying DVs
and the compact() materialization cost.

The claim under test: delete_where's write cost is O(matched positions)
— a selective predicate delete on a wide COW table writes a tiny DV file
instead of rewriting O(touched buckets) of data — while the read-side
penalty is one AQE-broadcast anti-join, and compact() folds it away.

Run:  python tools/dv_bench.py   (env SPARK_GRAFT_CPUS, default 32)
Prints one JSON line; numbers quoted in BENCH.md "Deletion vectors".
"""

from __future__ import annotations

import json
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
BUCKETS = 64


def _build(spark, path):
    t = ParquetLakeTable(spark, path, key="url", n_buckets=BUCKETS)
    rows = spark.range(N).select(
        F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias("url"),
        F.xxhash64("id").alias("v"),
        # a wide payload column so bucket rewrites carry real bytes
        F.repeat(F.md5(F.col("id").cast("string")), 8).alias("w"),
    )
    t.merge(rows, batch_id=0)
    return t


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dv_bench", cpus=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="gnarly_dv_")
    res: dict = {"rows": N, "n_buckets": BUCKETS, "cpus": cpus}
    try:
        # --- DV path: predicate delete of ~0.1% of rows -----------------
        t = _build(spark, f"{work}/dv")
        dt, out = _timed(lambda: t.delete_where("pmod(v, 1000) = 0"))
        res["dv_delete_sec"] = round(dt, 2)
        res["dv_rows_deleted"] = out["rows_deleted"]
        res["dv_bytes"] = sum(
            os.path.getsize(f) for f in t._manifest()["dvs"]
        )
        dt, n = _timed(lambda: t.read().count())
        res["read_with_dv_sec"] = round(dt, 2)
        dt, _ = _timed(lambda: t.compact())
        res["compact_materialize_sec"] = round(dt, 2)
        dt, n2 = _timed(lambda: t.read().count())
        res["read_after_compact_sec"] = round(dt, 2)
        assert n == n2

        # --- COW alternative: same delete via merge(delete_keys) --------
        t2 = _build(spark, f"{work}/cow")
        keys = t2.read().where("pmod(v, 1000) = 0").select("url")
        dt, _ = _timed(lambda: t2.merge(None, delete_keys=keys, batch_id=1))
        res["cow_delete_sec"] = round(dt, 2)
        res["cow_bytes_rewritten"] = sum(
            os.path.getsize(f)
            for fl in t2._manifest()["buckets"].values()
            for f in fl
        )
        dt, n3 = _timed(lambda: t2.read().count())
        res["read_after_cow_sec"] = round(dt, 2)
        assert n == n3, (n, n3)
        res["dv_vs_cow_write_speedup"] = round(
            res["cow_delete_sec"] / max(res["dv_delete_sec"], 1e-9), 1
        )
        print(json.dumps(res))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
