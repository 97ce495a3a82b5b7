"""spark-submit entry point for the batch training-data curation pass —
the deployable form of the catalog's pipeline_training_corpus /
pipeline_web_curation compositions:

    spark-submit --master <cluster> \
        --py-files dist/gnarly_spark.zip \
        jobs/curate_job.py \
        --input /crawl/wet --input-format wet \
        --out /corpus/shards --shards 256 \
        [--min-quality 0.35] [--lang en] [--dedup] \
        [--robots /crawl/robots_rules.parquet] \
        [--dsir-target "lang = 'en'"] [--dsir-min-logw 0] \
        [--text-col text] [--id-col doc_id]

Stages (each opt-in, applied in compliance -> cheap -> expensive order:
robots verdicts and scalar gates run before any shuffle-heavy stage, so
the dedup/DSIR relations only see survivors):

  1. read        — parquet docs (``--input-format parquet``: columns
                   id/text at least) or WET segments (``wet``: Common
                   Crawl extracted text; doc_id = url)
  2. robots      — drop pages a (host, prefix, allow) rules table
                   disallows (functions/url.py robots_filter; parse raw
                   robots.txt bodies with parse_robots upstream)
  3. gates       — quality_features score and/or lang_id equality
  4. dedup       — exact near-identical removal (normalized-text
                   fingerprint, keep the smallest id)
  5. dsir        — importance weights vs a ``--dsir-target`` exemplar
                   predicate; keep rows with dsir_logw >= threshold
  6. shard       — deterministic shuffle-shard export (write_shards)

Prints ONE JSON metrics line (rows surviving each stage) so schedulers
can assert progress. Exit code 0 only if the shard write commits.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", choices=["parquet", "wet"],
                    default="parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--shard-salt", default="42")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--lang", default=None)
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--robots", default=None,
                    help="parquet path of (host, prefix, allow) rules")
    ap.add_argument("--dsir-target", default=None, metavar="SQL_EXPR")
    ap.add_argument("--dsir-min-logw", type=int, default=0)
    ap.add_argument("--dsir-buckets", type=int, default=1024)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("gnarly_spark_curate").getOrCreate()
    try:
        from gnarly_spark.functions.text import (
            dsir_weights,
            lang_id,
            quality_features,
            write_shards,
        )
        from gnarly_spark.functions.url import robots_filter
        from gnarly_spark.operators.dedup import exact_duplicates

        tc, idc = args.text_col, args.id_col
        metrics: dict = {}
        live = None  # the persisted frontier; predecessors unpersist

        def stage(df, name):
            # persist-then-count: every later stage (and the final shard
            # write) reads THIS materialization instead of re-running the
            # whole upstream lineage per metrics count (review finding —
            # without it the WET parse and each gate's joins re-execute
            # once per downstream stage)
            nonlocal live
            df = df.persist()
            metrics[name] = df.count()
            if live is not None:
                live.unpersist()
            live = df
            return df

        if args.input_format == "wet":
            from gnarly_spark.sources.warc import read_wet

            docs = read_wet(spark, args.input).select(
                F.col("url").alias(idc), F.col("text").alias(tc)
            )
        else:
            docs = spark.read.parquet(args.input)
        docs = stage(docs, "input_rows")

        if args.robots is not None:
            rules = spark.read.parquet(args.robots)
            docs = (
                robots_filter(docs, rules, url_col=idc)
                .where(F.col("allowed"))
                .drop("allowed", "matched_prefix")
            )
            docs = stage(docs, "after_robots")

        if args.min_quality is not None:
            good = quality_features(docs, text_col=tc, id_col=idc).where(
                F.col("quality_score") >= args.min_quality
            ).select(idc)
            docs = docs.join(good, idc, "left_semi")
            docs = stage(docs, "after_quality")

        if args.lang is not None:
            docs = docs.where(lang_id(F.col(tc)) == args.lang)
            docs = stage(docs, "after_lang")

        if args.dedup:
            keep = exact_duplicates(docs, text_col=tc, id_col=idc).select(
                F.col("keep_id").alias(idc)
            )
            docs = docs.join(keep, idc, "left_semi")
            docs = stage(docs, "after_dedup")

        if args.dsir_target is not None:
            w = dsir_weights(
                docs,
                F.expr(args.dsir_target),
                n_buckets=args.dsir_buckets,
                text_col=tc,
                id_col=idc,
            ).where(F.col("dsir_logw") >= args.dsir_min_logw).select(idc)
            docs = docs.join(w, idc, "left_semi")
            docs = stage(docs, "after_dsir")

        metrics["shards"] = write_shards(
            docs, args.out, n_shards=args.shards,
            salt=args.shard_salt, id_col=idc,
        )
        if live is not None:
            live.unpersist()
        print(json.dumps(metrics), flush=True)
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
