"""A/B: the cost of ingesting through a BRANCH (write-audit-publish chain)
vs committing straight to main, plus the fast_forward publish cost alone.

The claim to evidence: branch commits pay exactly what main commits pay
(same data path; only the ref pointer differs), and fast_forward is
control-plane O(1) — one manifest copy + commit, no data I/O — so the
whole WAP-chain pattern costs ~zero over direct ingest at ANY table size.

Usage: PYTHONPATH=/root/repo python tools/branch_bench.py [n_batches] [rows_per_batch]
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.session import get_spark
from gnarly_spark.sinks.lake import ParquetLakeTable


def batch_df(spark, i, rows):
    return spark.range(rows).select(
        F.concat(F.lit("https://u/"), ((F.col("id") * 7 + i) % (rows * 2)).cast("string")).alias("url"),
        (F.col("id") + i * rows).alias("op_seq"),
        F.lit(float(i)).alias("value"),
    )


def ingest(spark, table, n_batches, rows):
    t0 = time.monotonic()
    for i in range(n_batches):
        table.merge(batch_df(spark, i, rows), batch_id=i)
    return time.monotonic() - t0


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="branch_bench")

    d = tempfile.mkdtemp(prefix="branch_bench_")
    # warmup: codegen/Arrow/parquet-writer paths, NOT timed — the first
    # merge of a fresh JVM pays several seconds of one-time cost that
    # would bias whichever leg runs first
    warm = ParquetLakeTable(spark, f"{d}/warm", key="url", n_buckets=16,
                            files_per_bucket=4)
    ingest(spark, warm, 2, rows)

    swap = os.environ.get("BRANCH_BENCH_SWAP") == "1"

    def leg_direct():
        main_t = ParquetLakeTable(spark, f"{d}/direct", key="url",
                                  n_buckets=16, files_per_bucket=4)
        return ingest(spark, main_t, n_batches, rows)

    def leg_branch():
        base = ParquetLakeTable(spark, f"{d}/wap", key="url", n_buckets=16,
                                files_per_bucket=4)
        br = base.create_branch("ingest")
        t = ingest(spark, br, n_batches, rows)
        t0 = time.monotonic()
        base.fast_forward("ingest")
        ff = time.monotonic() - t0
        assert base.read().count() == br.read().count()
        return t, ff

    if swap:
        t_branch, t_ff = leg_branch()
        t_direct = leg_direct()
    else:
        t_direct = leg_direct()
        t_branch, t_ff = leg_branch()

    out = {
        "metric": "branch-ingest overhead vs direct (sec)",
        "n_batches": n_batches,
        "rows_per_batch": rows,
        "direct_ingest_s": round(t_direct, 3),
        "branch_ingest_s": round(t_branch, 3),
        "fast_forward_s": round(t_ff, 4),
        "overhead_pct": round(100 * (t_branch + t_ff - t_direct) / t_direct, 2),
        "order": "branch_first" if swap else "direct_first",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
