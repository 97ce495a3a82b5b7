"""spark-submit maintenance job for the lake target: compaction + snapshot
expiry (the operational counterpart of jobs/ingest_job.py; ≈ Iceberg's
rewrite_data_files + expire_snapshots procedures).

    spark-submit --master <cluster> --py-files dist/gnarly_spark.zip \
        jobs/maintenance_job.py --table /lake/pages_pipeline/pages \
        [--keep-last 2] [--compact] [--rebucket N] [--files-per-bucket K] \
        [--cluster col1,col2 [--cluster-bits B]] [--key-bloom-ndv NDV] \
        [--delete-where "PREDICATE"] [--purge-keys url1,url2] \
        [--compact-hot N] \
        [--create-branch NAME | --fast-forward NAME | --merge-branch NAME \
         | --drop-branch NAME]

Run it between ingest runs — or concurrently: lake commits are
version-CAS'd, so a maintenance commit racing an ingest merge makes the
loser recompute and retry instead of erasing the winner (lake.py
_commit/_retrying). On a MOR table --compact folds outstanding deltas
(bucket-granular); on COW it rewrites every bucket into one snapshot.
--rebucket N re-hashes the table into N buckets (the sanctioned layout
migration — the constructor arg is manifest-sticky and deliberately
ignored on reopen). --cluster col1,col2 z-orders the base files on those
columns (OPTIMIZE ZORDER BY analog) so scan_range file-skips on any of
them. Snapshot expiry is control-plane-only. Prints one JSON line of
what was done/reclaimed.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="ParquetLakeTable path")
    ap.add_argument("--key", default="url")
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--rebucket", type=int, default=None, metavar="N")
    ap.add_argument("--files-per-bucket", type=int, default=1, metavar="K")
    ap.add_argument(
        "--cluster", default=None, metavar="COLS",
        help="comma-separated columns to z-order the base files on",
    )
    ap.add_argument("--cluster-bits", type=int, default=8, metavar="B")
    # key blooms are a WRITE knob (like files_per_bucket, not persisted in
    # the manifest): a table written with them must pass the same value
    # here or maintenance rewrites (--compact/--rebucket/--cluster) drop
    # them — on a clustered layout that silently loses the only remaining
    # row-group point-lookup guard. Size NDV to ~rows per data file, never
    # the table-wide distinct count (BENCH.md "key-bloom sizing": 20x bytes
    # for zero benefit).
    ap.add_argument("--key-bloom-ndv", type=int, default=None, metavar="NDV")
    ap.add_argument(
        "--compact-hot", type=int, default=None, metavar="N",
        help="backlog-driven compaction: fold only buckets with more than "
        "N outstanding delta files (compact_hot)",
    )
    ap.add_argument("--create-branch", default=None, metavar="NAME",
                    help="create a writable branch ref at the current head")
    ap.add_argument("--fast-forward", default=None, metavar="NAME",
                    help="publish a branch to main (refuses when diverged)")
    ap.add_argument("--merge-branch", default=None, metavar="NAME",
                    help="publish a DIVERGED branch by key-level three-way "
                    "merge (refuses on key conflicts)")
    ap.add_argument("--drop-branch", default=None, metavar="NAME",
                    help="remove a branch ref (expiry reclaims its commits)")
    ap.add_argument(
        "--update-where", default=None, nargs=2,
        metavar=("PREDICATE", "COL=EXPR[,COL=EXPR]"),
        help="predicate update via MERGE (ParquetLakeTable.update_where); "
        "assignments are comma-separated COL=EXPR pairs evaluated against "
        "the old row. Runs before --delete-where.",
    )
    ap.add_argument(
        "--delete-where", default=None, metavar="PREDICATE",
        help="predicate delete via positional deletion vectors (no bucket "
        "rewrite; ParquetLakeTable.delete_where). Runs before compaction, "
        "so --delete-where + --compact deletes AND materializes in one "
        "invocation.",
    )
    ap.add_argument(
        "--purge-keys", default=None, metavar="K1,K2",
        help="compliance HARD delete: comma-separated merge keys erased "
        "from every retained snapshot (history rewrite; see "
        "ParquetLakeTable.purge_keys). Runs before compaction/expiry.",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # only stop a session this job itself created: under spark-submit
    # getOrCreate makes one, but an embedder (tests, a driver program)
    # may already own the active session and must keep it
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("gnarly_spark_maintenance").getOrCreate()

    from gnarly_spark.sinks.lake import ParquetLakeTable

    tbl = ParquetLakeTable(
        spark,
        args.table,
        key=args.key,
        files_per_bucket=args.files_per_bucket,
        key_bloom_ndv=args.key_bloom_ndv,
    )
    out = {"table": args.table, "version_before": tbl.current_version()}
    if args.update_where:
        import re as _re

        pred, assigns = args.update_where
        # split on commas only where a new `col=` assignment starts — a
        # comma INSIDE an expression (greatest(v,0)) must not split, and
        # a fragment without '=' is an operator typo that must fail loud,
        # never be silently dropped
        parts = _re.split(r",(?=\s*\w+\s*=)", assigns)
        bad = [p for p in parts if "=" not in p]
        if bad:
            raise SystemExit(
                f"--update-where: malformed assignment fragment(s) {bad!r} "
                "(expected COL=EXPR[,COL=EXPR...])"
            )
        set_exprs = {
            k.strip(): v for k, v in (p.split("=", 1) for p in parts)
        }
        out["update_where"] = tbl.update_where(pred, set_exprs)
    if args.delete_where:
        out["delete_where"] = tbl.delete_where(args.delete_where)
    if args.purge_keys:
        out["purge"] = tbl.purge_keys(
            *[k.strip() for k in args.purge_keys.split(",") if k.strip()]
        )
    if args.create_branch:
        tbl.create_branch(args.create_branch)
        out["create_branch"] = args.create_branch
    if args.fast_forward:
        out["fast_forward"] = {
            "branch": args.fast_forward,
            "version": tbl.fast_forward(args.fast_forward),
        }
    if args.merge_branch:
        out["merge_branch"] = {
            "branch": args.merge_branch,
            "version": tbl.merge_branch(args.merge_branch),
        }
    if args.drop_branch:
        out["drop_branch"] = tbl.drop_branch(args.drop_branch)
    if args.compact_hot is not None and tbl.current_version() >= 0:
        out["compact_hot"] = tbl.compact_hot(max_deltas=args.compact_hot)
    if args.compact and tbl.current_version() >= 0:
        if tbl.mode == "mor":
            out["compact"] = tbl.compact()  # fold deltas, bucket-granular
        else:
            # COW consolidation = rebucket at the SAME bucket count: one
            # snapshot rewriting every bucket files_per_bucket-wide, with
            # batch_ids PRESERVED (the refire guard survives maintenance)
            # and the commit CAS-retried against concurrent ingest.
            # overwrite(read()) did neither — it resets batch_ids and
            # builds on the unpublished-window pointer.
            out["compact"] = tbl.rebucket(tbl.n_buckets)
    if args.rebucket is not None:
        out["rebucket"] = tbl.rebucket(args.rebucket)
    if args.cluster:
        out["cluster"] = tbl.cluster(
            by=[c.strip() for c in args.cluster.split(",") if c.strip()],
            bits=args.cluster_bits,
        )
    out.update(tbl.expire_snapshots(keep_last=args.keep_last))
    out["version_after"] = tbl.current_version()
    print(json.dumps(out))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
