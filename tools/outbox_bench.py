"""A/B: outbox snapshot-bootstrap export — r03 global-window+coalesce(1)
shape vs the shipped two-phase range sequencing + parallel write.

Builds a lake table of N keys, expires history so export_outbox must take
the full-snapshot 'r' path, and times the export. The OLD shape is
reproduced inline (global row_number + coalesce(1) single-file write) for
the A/B; the NEW path is the shipped export_outbox. Same seqs, same
envelope order in both.

    PYTHONPATH=/root/repo python tools/outbox_bench.py [n_rows]

MEASURED FINDING (round 4, this box): with the r04 shape (parallel write
+ DRIVER-SIDE SERIAL CONCAT into one v-file) the OLD single-task shape
was faster here (best-of-2 — 1M: 2.7 vs 3.0 s; 4M: 11.3 vs 13.1 s) —
this box has ONE virtual disk (CLAUDE.md: parquet I/O ceiling scales
0.29 from 8->32 cores), so the new path's localCheckpoint + 32-file
parallel write + sequential concat paid disk costs the single-task CPU
encode avoided. ROUND 5 removes the concat: a bootstrap-scale export now
publishes the range-ordered part files directly plus a manifest
(export_outbox multi-file layout), so the serial term is gone and the
remaining jobs are all parallel. What the two-phase buys at any scale is
the removal of the O(table)-rows-in-ONE-task sort/encode (driver-scale
memory ceiling and zero parallelism headroom) that makes the old shape a
non-starter for a 10^10-row snapshot bootstrap on a real cluster, where
per-executor disks make the parallel write the only viable topology.
Unlike the ANN rank (see topk_bench.py), WindowGroupLimit can NOT rescue
the old shape: there is no rank-limit filter, so the global window is a
genuine SinglePartition exchange of every row."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from gnarly_spark.session import get_spark
from gnarly_spark.sinks.lake import ParquetLakeTable
from gnarly_spark.sources.debezium import JSON_OPTS, export_outbox


def old_shape_export(feed, out_path: str) -> int:
    """The r03 topology: one global window sort + one-task text write."""
    data_cols = [c for c in feed.columns if c not in ("url", "_change_type")]
    img = F.struct(F.col("url"), *[F.col(c) for c in data_cols])
    merged = (
        feed.select(
            F.col("url").alias("_k"),
            F.when(
                F.col("_change_type").isin("insert", "update_after", "snapshot"), img
            ).alias("after"),
        )
        .groupBy("_k")
        .agg(F.max("after").alias("after"))
    )
    seq = F.row_number().over(Window.orderBy("_k")) - 1
    env = merged.select(
        "after",
        F.struct(
            F.lit("gnarly").alias("name"),
            seq.cast("long").alias("seq"),
            F.lit(0).cast("long").alias("version"),
        ).alias("source"),
        F.lit("r").alias("op"),
        F.lit(None).cast("long").alias("ts_ms"),
    ).select(F.to_json(F.struct("*"), JSON_OPTS).alias("value"))
    tmp = out_path + ".tmp"
    env.coalesce(1).write.mode("overwrite").text(tmp)
    part = next(p for p in os.listdir(tmp) if p.startswith("part-"))
    with open(os.path.join(tmp, part)) as f:
        n = sum(1 for _ in f)
    os.replace(os.path.join(tmp, part), out_path)
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="outbox_bench", cpus=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="gnarly_outbox_bench_")
    t = ParquetLakeTable(spark, os.path.join(work, "t"), key="url", n_buckets=8)
    rows = spark.range(n_rows).select(
        F.format_string("https://ex.com/p/%012d", "id").alias("url"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    t.merge(rows, batch_id=0)
    t.merge(
        rows.where(F.col("v") % 997 == 0).withColumn("v", F.col("v") + 1),
        batch_id=1,
    )
    t.expire_snapshots(keep_last=1)  # force the 'r' bootstrap path

    import subprocess

    # CLAUDE.md: benchmarks are polluted by ANY concurrent Spark session
    probe = subprocess.run(
        ["pgrep", "-af", "pytest|check_oracle"], capture_output=True, text=True
    )
    if probe.stdout.strip():
        print(f"WARNING: concurrent Spark work detected:\n{probe.stdout}",
              file=sys.stderr)

    out = {"n_rows": n_rows, "cpus": cpus}
    snap = t.read()
    feed = snap.select(
        "url",
        F.lit("snapshot").alias("_change_type"),
        *[c for c in snap.columns if c != "url"],
    )
    # best-of-2 per variant (CLAUDE.md: VM timing variance is large);
    # export_outbox advances a cursor, so each leg gets a fresh dir
    best_old = None
    for i in range(2):
        t0 = time.monotonic()
        n_old = old_shape_export(feed, os.path.join(work, f"old_v1_{i}.jsonl"))
        dt = time.monotonic() - t0
        best_old = dt if best_old is None else min(best_old, dt)
    out["old_single_task_sec"] = round(best_old, 3)

    best_new = None
    for i in range(2):
        t0 = time.monotonic()
        r = export_outbox(t, os.path.join(work, f"outbox_{i}"))
        dt = time.monotonic() - t0
        best_new = dt if best_new is None else min(best_new, dt)
    out["new_two_phase_sec"] = round(best_new, 3)
    out["speedup"] = round(out["old_single_task_sec"] / out["new_two_phase_sec"], 2)
    assert r["envelopes"] == n_old == n_rows, (r, n_old)
    files = sorted(os.listdir(os.path.join(work, "outbox_1")))
    out["new_layout"] = (
        "multi-file" if any("-part-" in f for f in files) else "single-file"
    )
    out["new_n_files"] = sum(1 for f in files if f.endswith(".jsonl"))
    # seqs must be the global key rank in both: spot-check line order
    vfile = next(
        os.path.join(work, "outbox_1", f)
        for f in files
        if f.endswith(".jsonl")
    )
    import itertools

    with open(vfile) as f:
        first = [json.loads(x)["source"]["seq"] for x in itertools.islice(f, 1000)]
    out["seqs_ordered"] = first == list(range(1000))
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
