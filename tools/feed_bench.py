"""lakefeed drain throughput at two parallelism levels → BENCH.md.

The new streaming source's scale claim is "one InputPartition per delta
file, Arrow-batch executor reads" — so drain rate should track cores
until the disk does. Evidence: build ONE MOR table (8 commits x 250k
rows = 2M change rows, 16 buckets -> up to 128 delta-file partitions),
then drain the full feed (availableNow, parquet sink) in a FRESH JVM at
local[8] and local[32] and report rows/s at both plus N->4N efficiency,
normalized against this box's measured parquet read->write I/O ceiling
(CLAUDE.md: 0.26-0.30 raw from 8->32 on the single virtual disk).

Run: PYTHONPATH=/root/repo python tools/feed_bench.py
Child mode (one timed drain): feed_bench.py --drain <table> <cpus>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROWS_PER_COMMIT = 250_000
COMMITS = 8


def build(table: str) -> None:
    from pyspark.sql import functions as F

    from gnarly_spark.session import get_spark
    from gnarly_spark.sinks.lake import ParquetLakeTable

    spark = get_spark(app_name="feed_bench_build", cpus=32)
    t = ParquetLakeTable(spark, table, key="url", n_buckets=16, mode="mor")
    for k in range(COMMITS):
        rows = spark.range(ROWS_PER_COMMIT).select(
            F.format_string("url%09d", (F.col("id") * COMMITS + k)).alias("url"),
            (F.col("id") + k).cast("double").alias("value"),
            F.repeat(F.lit("p"), 120).alias("payload"),
        )
        t.merge(rows, batch_id=k)
    spark.stop()


def drain(table: str, cpus: int) -> None:
    from gnarly_spark.session import get_spark
    from gnarly_spark.sources.lakefeed import LakeFeedDataSource

    spark = get_spark(app_name=f"feed_bench_{cpus}", cpus=cpus)
    spark.dataSource.register(LakeFeedDataSource)
    work = tempfile.mkdtemp(prefix=f"feed_drain_{cpus}_")
    t0 = time.time()
    q = (
        spark.readStream.format("lakefeed")
        .option("path", table)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "out"))
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.time() - t0
    n = spark.read.parquet(os.path.join(work, "out")).count()
    spark.stop()
    print(json.dumps({"cpus": cpus, "rows": n, "wall_s": round(wall, 2)}))


def main() -> None:
    table = os.path.join(tempfile.mkdtemp(prefix="feed_bench_"), "t")
    build(table)
    res = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--drain", table, str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            env={**os.environ, "PYTHONPATH": os.path.dirname(HERE)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res[cpus] = json.loads(line)
        print(res[cpus], flush=True)
    expected = ROWS_PER_COMMIT * COMMITS
    assert all(r["rows"] == expected for r in res.values()), res
    r8, r32 = (res[c]["rows"] / res[c]["wall_s"] for c in (8, 32))
    eff = (r32 / r8) / 4
    lines = [
        "",
        "<!-- feed-bench -->",
        "## Round 2: lakefeed drain scaling (streaming source, 2M change rows)",
        "",
        f"One MOR table, {COMMITS} commits x {ROWS_PER_COMMIT:,} rows (16",
        "buckets -> up to 128 delta-file input partitions); full feed",
        "drained from version 0 with availableNow into a parquet sink,",
        "fresh JVM per level. Wall time includes stream planning and sink",
        "commits (everything after session start) — the honest number.",
        "",
        "| local[N] | wall s | rows/s |",
        "|---|---|---|",
        f"| 8 | {res[8]['wall_s']} | {r8:,.0f} |",
        f"| 32 | {res[32]['wall_s']} | {r32:,.0f} |",
        "",
        f"8->32 raw efficiency {eff:.2f} vs this box's parquet read->write",
        "I/O ceiling 0.26-0.30 (one virtual disk; CLAUDE.md) — the drain is",
        "a parquet-in -> parquet-out job, so the disk is the serial term",
        "here. On a real cluster the per-file partitions spread across",
        "executors and the sink stripes across object-store writers.",
        "<!-- feed-bench-end -->",
        "",
    ]
    out_txt = "\n".join(lines)
    print(out_txt)
    bench_path = os.path.join(HERE, "..", "BENCH.md")
    cur = open(bench_path).read()
    start, end = "<!-- feed-bench -->", "<!-- feed-bench-end -->"
    if start in cur and end in cur:
        pre_s, _, rest = cur.partition(start)
        _, _, post_s = rest.partition(end)
        cur = pre_s + out_txt.strip("\n") + post_s
    else:
        cur = cur + out_txt
    with open(bench_path, "w") as f:
        f.write(cur)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--drain":
        drain(sys.argv[2], int(sys.argv[3]))
    else:
        main()
