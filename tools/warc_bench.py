"""WARC boundary throughput: distributed write + parse at two parallelism
levels (the BASELINE scaling protocol applied to the crawl-ingest source).

Generates ~800k pages x ~1 KB html (~800 MB payload) as 64 WARC segments,
then times: gzipped segment write, batch read+parse (count + payload-byte
sum so the parse is not dead-code-eliminated). Fresh JVM per leg:

    SPARK_GRAFT_CPUS=8  python tools/warc_bench.py
    SPARK_GRAFT_CPUS=32 python tools/warc_bench.py
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
from gnarly_spark.sources.warc import read_warc, write_warc

N = 800_000
SEGMENTS = 64


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="warc_bench", cpus=cpus, shuffle_partitions=cpus)
    # repartition the IDS, then generate payload post-shuffle: the shuffle
    # carries 8 bytes/row, not the 1 KB payload (this box has one virtual
    # disk — shuffling 200 MB of payload serializes both legs on it)
    docs = spark.range(N).repartition(SEGMENTS).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_add(
            "SECOND", F.col("id"), F.lit("2026-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body>"),
                F.repeat(F.concat(F.lit("w"), (F.col("id") % 97).cast("string"), F.lit(" ")), 250),
                F.lit("</body></html>"),
            ),
            "utf-8",
        ).alias("payload"),
    )
    work = tempfile.mkdtemp(prefix="warc_bench_")
    try:
        # warm-up leg first: Python-worker daemon fork + Arrow init +
        # codegen cost ~2.4s ONCE per JVM — excluded (steady-state is what
        # a long-running ingest sees), then best-of-2 fresh runs
        write_warc(docs, os.path.join(work, "warm"), compress=True)
        t_write, manifest = None, None
        for i in range(2):
            t0 = time.time()
            m = write_warc(docs, os.path.join(work, f"run{i}"), compress=True)
            dt = time.time() - t0
            if t_write is None or dt < t_write:
                t_write, manifest = dt, m
        disk_mb = sum(os.path.getsize(f) for f, _ in manifest) / 1e6

        def read_q():
            return (
                read_warc(spark, os.path.join(work, "run0", "*.warc.gz"))
                .agg(F.count("*").alias("n"), F.sum(F.length("payload")).alias("b"))
                .collect()[0]
            )

        agg = read_q()  # warm
        t_read = None
        for _ in range(2):
            t0 = time.time()
            agg = read_q()
            dt = time.time() - t0
            t_read = dt if t_read is None or dt < t_read else t_read
        payload_mb = agg["b"] / 1e6
        assert agg["n"] == N
        print(
            f"cpus={cpus} segments={SEGMENTS} records={N} "
            f"payload={payload_mb:.0f}MB disk_gz={disk_mb:.0f}MB"
        )
        print(f"write: {t_write:.1f}s = {N / t_write:,.0f} rec/s, {payload_mb / t_write:.0f} MB/s")
        print(f"read : {t_read:.1f}s = {N / t_read:,.0f} rec/s, {payload_mb / t_read:.0f} MB/s")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
