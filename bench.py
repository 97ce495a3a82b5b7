"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is total wall seconds over the headline set. Extra keys report the
flagship CDC replay throughput (change-events/sec — the BASELINE.json
metric). Scaling-efficiency evidence (same job at two parallelism levels)
lives in tools/run_scaling.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# end-to-end DEMOS (multi-job lake/pipeline exercises — expensive by
# design, ~12 real jobs each for cdc_branch_publish etc.): timed and
# reported, but totaled separately so per-query regressions in the
# operator-shaped CORE stay legible against this box's VM steal
# (VERDICT r03 ask #8: report both totals)
DEMOS = {
    "cdc_branch_publish",
    "cdc_delete_vectors",
    "cdc_incremental_merge",
    "pipeline_web_curation",
    "src_cdc_envelope",
    "src_cdx_fetch",
    "web_sitemap_recrawl",
    "web_robots_sitemaps",
    "web_fetch_schedule",
    "sim_semdedup_pairs",
    "sim_pq_ann",
    "sim_pq_refined",
    "graph_pagerank",
    "graph_hits",
}

HEADLINE = [
    "cdc_replay_lww",
    "cdc_fold_abelian",
    "cdc_incremental_merge",
    "a2_lww_latest",
    "a1_running_balance",
    "cdc_block_metrics",
    "j4_broadcast_enrich",
    "j_semi_anti",
    "q1_lineitem_agg",
    "q6_filter_agg",
    "q3_topk_join",
    "q5_multijoin",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "text_decontaminate",
    "text_pack_sequences",
    "sim_bruteforce_topk",
    "sim_quantize_int8",
    "cdc_asof_join",
    "w_sessionize",
    "dedup_simhash_pairs",
    "mm_media_features",
    "text_tfidf_search",
    "sketch_hll_distinct",
    "sketch_cms_topk",
    "text_gopher_repetition",
    "graph_pagerank",
    "web_url_canonicalize",
    "sketch_bottomk_quantiles",
    "text_bpe_token_count",
    "mm_image_dims",
    "mm_av_metadata",
    "dedup_strip_spans",
    "sim_neardup_lsh",
    "sim_semdedup_pairs",
    "web_registrable_domain",
    "web_anchor_text",
    "web_robots_filter",
    "web_parse_robots",
    "web_surt_key",
    "text_dsir_weights",
    "pipeline_web_curation",
    "w_resample_ffill",
    "sim_pq_ann",
    "sim_pq_refined",
    "cdc_branch_publish",
    "src_cdc_envelope",
    "web_sitemap_recrawl",
    "cdc_delete_vectors",
    "graph_hits",
    "sketch_kmv_jaccard",
    "src_cdx_fetch",
    "web_fetch_schedule",
    "web_robots_sitemaps",
    # cdc_zorder_scan is deliberately NOT here: it is a maintenance
    # rewrite (build + cluster a lake table per run), not a query —
    # its cost/benefit study lives in BENCH.md "Z-order clustering"
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    import __spark_entry__ as entrymod
    from gnarly_spark.session import get_spark

    spark = get_spark(app_name="gnarly_bench", cpus=cpus, shuffle_partitions=cpus)
    # Benign-noise suppression (VERDICT r03 #3): FileStreamSink's metadata
    # probe logs a WARN + FileNotFoundException stack when a read glob is
    # resolved (the query then passes), and the bounded seed-selection
    # windows log the single-partition WindowExec warning on inputs
    # limited to n_centroids rows — neither is actionable, and the stack
    # made the driver's bench record open mid-trace. Scoped to these two
    # loggers only; everything else keeps WARN.
    try:
        jvm = spark.sparkContext._jvm
        for noisy in (
            # Spark 4 moved FileStreamSink under .streaming.sinks
            "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
            "org.apache.spark.sql.execution.streaming.FileStreamSink",
            "org.apache.spark.sql.execution.window.WindowExec",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                noisy, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:
        pass  # logging tweak only — never fail the bench over it
    qs = entrymod.queries()

    # warm the JVM/codegen/Arrow-UDF paths once (not timed): one full run of
    # the flagship replay, same protocol as tools/scaling_job.py — timings
    # below measure steady state, as a sustained ingest job runs
    qs["cdc_replay_lww"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    keep: list = []  # hold every built plan alive until the JVM exits —
    # GC'ing a localCheckpointed DataFrame mid-bench lets the
    # ContextCleaner drop its accumulators while a later run still
    # references the materialized stage, spraying benign-but-noisy
    # "non-existent accumulator" ERRORs into the driver log
    for name in HEADLINE:
        best = None
        for _ in range(2):  # best-of-2, fresh plan per run (AQE caches
            t0 = time.monotonic()  # materialized stages on reused DF objects)
            df = qs[name](spark, sf_dir)
            keep.append(df)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    total = round(sum(timings.values()), 3)
    core_total = round(
        sum(v for k, v in timings.items() if k not in DEMOS), 3
    )
    out = {
        "metric": "total wall sec over headline CDC/dedup/similarity/relational queries",
        "value": total,
        "unit": "sec",
        "core_total_sec": core_total,  # operator-shaped subset
        "demo_total_sec": round(total - core_total, 3),  # e2e lake/pipeline demos
        "n_core": sum(1 for k in timings if k not in DEMOS),
        "n_demo": sum(1 for k in timings if k in DEMOS),
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "flagship_events_per_s": round(n_events / max(timings["cdc_replay_lww"], 1e-9), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
