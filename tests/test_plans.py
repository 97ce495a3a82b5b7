"""Physical-plan assertions: the plans we'd want at 100 TB, not just plans
that pass. Checks pushdown, broadcast strategies, partial aggregation, and
absence of Python row-at-a-time evaluation in hot paths."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    """S4: both predicates must appear in PushedFilters on the scan."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    df = e.where((F.col("event_type") == "click") & F.col("event_id").between(100, 500)).select(
        "event_id", "user_id"
    )
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    assert "EqualTo(event_type,click)" in plan
    # the PushedFilters list is truncated in toString; the range predicate
    # is visible in DataFilters
    assert "(event_id#" in plan and ">= 100)" in plan


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must read 2 columns, not the whole schema."""
    e = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = e.select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_revert_exclusion_is_broadcast_anti_join(spark, to_spark):
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.operators.replay import live_events

    log = to_spark(gen_changelog(n_blocks=10, events_per_block=5, fork_depth=2))
    plan = plan_of(live_events(log))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_lww_is_partial_aggregation(spark, to_spark):
    """max_by LWW must run a map-side partial aggregate before the shuffle
    (the skew defense); a window row_number plan would have neither."""
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.operators.replay import final_state

    log = to_spark(gen_changelog(n_blocks=10, events_per_block=5))
    plan = plan_of(final_state(log, with_text=False))
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_dim_join_is_broadcast(spark):
    import gnarly_spark.catalog as cat

    plan = plan_of(cat.QUERIES["j4_broadcast_enrich"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_ordered_limit_is_takeordered(spark):
    """O1 must not materialize a full global sort for a LIMIT."""
    import gnarly_spark.catalog as cat

    plan = plan_of(cat.QUERIES["o1_ordered_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_no_python_udf_in_relational_paths(spark):
    """Hot relational queries stay fully JVM-side (no BatchEvalPython /
    row-at-a-time Python)."""
    import gnarly_spark.catalog as cat

    for name in ["cdc_fold_abelian", "a2_lww_latest", "q1_lineitem_agg", "q3_topk_join"]:
        plan = plan_of(cat.QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_extraction_is_arrow_vectorized_not_row_python(spark, to_spark):
    """The only Python in the replay plan is the Arrow-batched pandas UDF."""
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.operators.replay import final_state

    log = to_spark(gen_changelog(n_blocks=5, events_per_block=5))
    plan = plan_of(final_state(log, with_text=True))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_whole_stage_codegen_and_partial_agg_in_q1(spark):
    import gnarly_spark.catalog as cat

    df = cat.QUERIES["q1_lineitem_agg"](spark, SF)
    plan = plan_of(df)
    assert "partial_sum" in plan, "map-side combine missing"
    df.collect()  # finalize the df's own AQE plan (a write wraps a new one)
    final = plan_of(df)  # AQE final plan carries the codegen '*(n)' markers
    assert "isFinalPlan=true" in final and "*(" in final


def test_minhash_is_single_min_agg_no_k_explode(spark):
    """MinHash signatures must be ONE groupBy with k min columns (map-side
    partial min => shuffle carries one row per id), not an explode(xk) that
    multiplies the shingle relation through the exchange."""
    from gnarly_spark.operators.dedup import _minhash_agg, shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(_minhash_agg(shingles(docs), 8))
    assert "partial_min" in plan, "map-side combine missing on minhash agg"
    # exactly one Generate: the shingle explode; the k hashes are columns
    assert plan.count("Generate explode") == 1


def test_extraction_runs_after_dedup_not_before(spark, to_spark):
    """Cost discipline: the UDF must sit above the aggregate in the plan —
    extracting before LWW would pay the UDF for every event instead of
    every winner (100x at 10^10 events / 10^8 urls)."""
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.operators.replay import final_state

    log = to_spark(gen_changelog(n_blocks=5, events_per_block=5))
    plan = plan_of(final_state(log, with_text=True))
    udf_pos = plan.index("ArrowEvalPython")
    agg_pos = plan.index("max_by")
    assert udf_pos < agg_pos, "UDF must be above (after) the aggregation in the tree"


def test_simhash_single_groupby_no_bit_explode(spark):
    """SimHash must be ONE groupBy(id) carrying 32 conditional sums (the
    _minhash_agg pattern) — an explode(sequence(0,31)) would multiply the
    distinct-token relation 32x through the (id, b) exchange."""
    from gnarly_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(simhash(docs, bits=32))
    assert "partial_sum" in plan, "map-side combine missing on bit sums"
    # exactly one Generate: the token-split explode; bits are agg columns
    assert plan.count("Generate explode") == 1


def test_simhash_pairs_blocking_is_equi_join_no_cartesian(spark):
    """Hamming-radius pair search must run as ONE (band, band_val)
    equi-join over the banded signatures — never a cartesian / nested-loop
    all-pairs comparison (the thing banding exists to avoid)."""
    from gnarly_spark.operators.dedup import simhash_hamming_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(simhash_hamming_pairs(docs, max_hamming=3, bands=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_val" in plan  # the blocking key is the join key


def test_simhash_combination_blocking_plan_and_keyspace(spark):
    """Combination-blocking mode keeps the same plan shape (one equi-join
    on band_val, no cartesian, no broadcast) while the join keyspace is
    >= 2^32 — the property that bounds candidate volume at 1e10 docs where
    disjoint 16-bit bands go quadratic."""
    from gnarly_spark.operators.dedup import (
        combination_key_bits,
        simhash_hamming_pairs,
    )

    assert combination_key_bits(64, 6, 3) == 31  # vs 16 for disjoint bands
    assert combination_key_bits(64, 7, 3) >= 32  # b=7 crosses 2^32
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(
        simhash_hamming_pairs(docs, max_hamming=3, bits=64, combination_blocks=6)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "band_val" in plan
    # per join side: one Generate for the token split + ONE for the
    # 20-key posexplode (the keys ride a single array, never 20 explodes);
    # the self-join materializes the subtree twice -> 4 total
    assert plan.count("Generate") <= 4, plan.count("Generate")


def test_neardup_lsh_is_banded_equi_join_corpus_never_broadcast(spark):
    """Embedding near-dup at scale: candidates from ONE equi-join on
    (band, band_key) — no cartesian/nested-loop, and the corpus relation
    is never broadcast (it's the 10^10 side; only shuffle_hash joins)."""
    from gnarly_spark.operators.similarity import neardup_pairs_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(neardup_pairs_lsh(emb, threshold=0.35, n_planes=16, bands=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "band_key" in plan


def test_url_canonicalize_cascade_no_expand(spark):
    """The url census must stay a no-Expand cascade: raw-spelling count
    first (regex once per DISTINCT spelling), then plain-sum rollups —
    two countDistincts in one groupBy put a 3x Expand on an event-sized
    shuffle (the r02 headline-slowest query until this rewrite)."""
    from gnarly_spark.catalog_graph import web_url_canonicalize

    plan = plan_of(web_url_canonicalize(spark, SF))
    assert "Expand" not in plan, "distinct-aggregate Expand crept back in"
    assert plan.count("partial_sum") >= 1  # rollups partial-aggregate


def test_corpus_dedup_joins_never_broadcast(spark):
    """Every join side in the shingle-pair operators is O(corpus) — banded
    self-join, shingle verify joins, per-doc size joins — so NONE may be
    planned as a broadcast: localCheckpoint preserves the child's size
    estimate and explode doesn't grow it, so the static planner happily
    broadcast an 11.6M-row shingle relation (8 GB-driver OOM at 200k docs)
    until the shuffle_hash hints pinned these joins distributed."""
    from gnarly_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs, simhash_hamming_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint()
    for df in (
        minhash_lsh_pairs(docs, k=8, bands=4, threshold=0.5),
        jaccard_pairs(docs, threshold=0.5),
        simhash_hamming_pairs(docs, max_hamming=3, bands=4, bits=64),
    ):
        plan = plan_of(df)
        assert "BroadcastExchange" not in plan, plan[:800]
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
        # the hinted side of a shuffle_hash join is its per-partition hash
        # BUILD side — every hint sits on the LEFT (candidate-derived or
        # self-join) relation, so a BuildRight here means a corpus-sized
        # relation is being hash-built in executor memory
        assert "BuildRight" not in plan, plan[:800]


def test_ivf_plan_constant_in_centroids_and_dim(spark):
    """C=256, dim=128 (a real IVF shape scaled down): centroid coordinates
    must live in a broadcast relation, never as plan literals — plan size
    is O(1) in C x dim, so building the quantizer can't blow up the
    driver at C=4096/dim=768."""
    from gnarly_spark.operators.similarity import ivf_build

    corpus = spark.range(512).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 128), "
            "j -> cast(pmod(xxhash64(id, j), 1000) as float) / 1000.0)"
        ).alias("embedding"),
    )
    centroids, assigned = ivf_build(corpus, n_centroids=256, iterations=1)
    plan = optimized_of(assigned)
    # a literal-centroid plan at C=256 x dim=128 would carry ~32k float
    # literals (hundreds of KB of plan text); the join-based plan is tiny
    assert len(plan) < 20_000, f"plan size {len(plan)} suggests centroid literals"
    assert centroids.count() == 256
    assert assigned.groupBy().count().collect()[0][0] == 512


def test_ivf_written_table_prunes_partitions(spark, tmp_path):
    """The written IVF table must turn a probe into PARTITION PRUNING at
    the scan (PartitionFilters on cluster), not a post-scan filter —
    that's the read-fraction claim of IVF at corpus scale."""
    from gnarly_spark.operators.similarity import ivf_query_partitioned, ivf_write

    corpus = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), j -> cast(pmod(xxhash64(id, j), 1000) as float) / 1000.0)"
        ).alias("embedding"),
    )
    path = str(tmp_path / "ivf_tbl")
    ivf_write(corpus, path, n_centroids=8, iterations=1)
    qv = [list(r.embedding) for r in corpus.where(F.col("vec_id") < 2).collect()]
    out = ivf_query_partitioned(spark, path, [(0, qv[0]), (1, qv[1])], k=3, n_probe=2)
    plan = plan_of(out)
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan[:2000]
    got = out.collect()
    assert len(got) > 0 and all(1 <= r.rank <= 3 for r in got)


def test_incremental_lsh_corpus_never_shuffle_joined(spark):
    """dedup_incremental_lsh: every join must be a BroadcastHashJoin with
    the batch side broadcast — the corpus band/signature relations are
    scanned but never sort-merge/shuffle-hash joined (the 100 TB contract:
    per-batch dedup cost is O(batch), not O(corpus shuffle))."""
    from gnarly_spark.operators.dedup import incremental_lsh_dups, minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_sigs = minhash_signatures(docs.where(F.col("doc_id") % 10 < 8))
    out = incremental_lsh_dups(docs.where(F.col("doc_id") % 10 >= 8), corpus_sigs)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_semdedup_incremental_candidate_join_broadcasts_batch(spark):
    """semantic_dedup_incremental: the CANDIDATE join (batch assignments ⋈
    corpus inverted file on cluster) must broadcast the batch side — the
    corpus is scanned, never shuffled there (per-batch dedup cost O(batch),
    the same contract as incremental LSH). The build itself may shuffle
    (in deploy it's precomputed by ivf_write), so the assert targets the
    candidate join: no sort-merge/shuffled-hash join anywhere, and the
    broadcast feeding a join is the batch-assignment relation."""
    from gnarly_spark.operators.similarity import semantic_dedup_incremental

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semantic_dedup_incremental(
        emb.where(F.col("vec_id") % 10 >= 8),
        emb.where(F.col("vec_id") % 10 < 8),
        threshold=0.35,
        n_centroids=8,
        iterations=1,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Co-located join via native bucketing (the pre-shuffled layout the
    prompt calls out): two tables bucketBy(8, url) + sortBy(url) join on
    url with ZERO Exchange and ZERO Sort in the final plan — at 100 TB
    this is the difference between a free merge and shuffling both
    corpora. (The lake's own bucket layout gives the same property to
    MERGE; this proves the catalog-table variant end-to-end.)"""
    import uuid

    a, b = (f"bt_{uuid.uuid4().hex[:8]}_{i}" for i in (0, 1))
    rows = spark.range(2000).selectExpr(
        "concat('https://u/', id) AS url", "id AS v"
    )
    try:
        for name in (a, b):
            (
                rows.write.bucketBy(8, "url")
                .sortBy("url")
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(a).join(spark.table(b), "url")
            assert j.count() == 2000
            plan = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        assert "ENSURE_REQUIREMENTS" not in plan
    finally:
        for name in (a, b):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_chunk_passages_is_map_only(spark):
    """Chunking 10^10 docs must be a single scan: split + transform +
    posexplode, ZERO Exchange of any kind."""
    from gnarly_spark.functions.text import chunk_passages

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(chunk_passages(docs))
    assert "Exchange" not in plan, plan[:1500]
    assert "Generate" in plan  # the one explode


def test_unigram_surprisal_total_rides_broadcast(spark):
    """The corpus token total N is a 1-row aggregate: it must annotate the
    vocab via a broadcast (nested-loop on one row = free), never by
    shuffling the vocab against it."""
    from gnarly_spark.functions.text import unigram_surprisal

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(unigram_surprisal(docs))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_recrawl_schedule_one_shuffle_partial_agg(spark):
    """The whole frontier computation is ONE partial-aggregating groupBy:
    exactly one Exchange, with map-side partial min/max/count."""
    from gnarly_spark.catalog import _changelog_df
    from gnarly_spark.operators.temporal import recrawl_schedule

    log = _changelog_df(spark, SF)
    plan = plan_of(recrawl_schedule(log, "2024-02-01 00:00:00"))
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "partial_" in plan


def test_pq_adc_plan_broadcasts_luts_never_codes(spark):
    """The PQ/ADC scan must broadcast the per-query LUTs onto the codes
    relation (the corpus side is map-only scanned, never broadcast or
    shuffled into a cartesian), and codebook coordinates must be data,
    not plan literals — plan size O(1) in m x n_codes x dim."""
    from gnarly_spark.operators.similarity import pq_ann_topk_fixed

    corpus = spark.range(256).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), "
            "j -> cast(pmod(xxhash64(id, j), 1000) as float) / 1000.0)"
        ).alias("embedding"),
    )
    topk = pq_ann_topk_fixed(corpus, [0, 1], k=3, m_subspaces=8, n_codes=16)
    plan = plan_of(topk)
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan  # LUTs ride a broadcast join
    opt = optimized_of(topk)
    assert len(opt) < 25_000, f"plan size {len(opt)} suggests codebook literals"
    rows = topk.collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(1 <= r.rank <= 3 for r in rows)


def test_debezium_parse_is_jvm_only(spark):
    """The envelope parse (incl. the schemas.enable unwrap) is from_json/
    get_json_object under codegen — no Python evaluation in the source
    hot path."""
    from gnarly_spark.sources.debezium import debezium_events, parse_debezium

    ddl = "op_seq long, op string, url string, v double"
    lines = spark.createDataFrame([("x",)], "value string")
    plan = plan_of(debezium_events(parse_debezium(lines, ddl), ddl))
    assert "EvalPython" not in plan  # Batch- and Arrow- variants both


def test_sitemap_parse_is_jvm_only_no_shuffle(spark):
    """Sitemap explode+regexp parse: map-side JVM, no exchange, no
    Python."""
    from gnarly_spark.sources.sitemap import parse_sitemap

    df = spark.createDataFrame([("h", "<urlset/>")], "host string, xml string")
    plan = plan_of(parse_sitemap(df))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # parse itself never shuffles


def test_dv_read_is_anti_join_no_cartesian(spark, tmp_path):
    """A DV-carrying snapshot reads as scan + LeftAnti against the tiny
    DV relation — never a cartesian, never Python."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"),
        batch_id=0,
    )
    t.delete_where("v = 1")
    plan = plan_of(t.read())
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_kmv_jaccard_no_global_window(spark):
    """The ungrouped bottom-k must take the mergeable per-partition path:
    every Window in the plan is partitioned (no move-everything-to-one-
    partition sort)."""
    import re as _re

    from gnarly_spark.functions.sketches import kmv_jaccard

    a = spark.createDataFrame([(f"u{i}",) for i in range(50)], "id string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(50)], "id string")
    plan = plan_of(kmv_jaccard(a, b, "id", k=8))
    # Spark prints an unpartitioned window sort as 'Window [...], [...]'
    # with an empty partition spec — assert every Window line carries a
    # partition expression (_pid)
    for line in plan.splitlines():
        if _re.search(r"\bWindow\b", line):
            assert "_pid" in line, line


def test_ann_topk_rank_is_two_phase_no_corpus_window(spark):
    """VERDICT r03 finding #1: the ANN/brute-force serving rank must never
    route a corpus-sized relation through Window.partitionBy(query_id)
    alone (one task per query sorting |corpus| rows). The local phase
    ranks per (input partition, query); the only query_id-partitioned
    window sits ABOVE the local-top-k filter, i.e. over the
    <= k * n_partitions survivors."""
    import re as _re

    from gnarly_spark.operators.similarity import cosine_topk

    corpus = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), "
            "j -> cast(pmod(xxhash64(id, j), 1000) as float) / 1000.0)"
        ).alias("embedding"),
    )
    topk = cosine_topk(corpus, [0, 1, 2], k=3)
    plan = plan_of(topk)
    lines = plan.splitlines()
    win_lines = [(i, l) for i, l in enumerate(lines) if _re.search(r"\bWindow\b", l)]
    assert win_lines, plan
    filt = [i for i, l in enumerate(lines) if "Filter" in l and "_lrk" in l]
    assert filt, "local top-k filter missing from plan"
    for i, line in win_lines:
        if "_pid" in line:
            continue  # local phase: partitioned by (_pid, query_id)
        # global merge rank: allowed only above the local-top-k filter
        # (children print after the parent in the tree string)
        assert "query_id" in line, line
        assert any(j > i for j in filt), f"corpus-sized per-query window: {line}"
    # the local sort spreads across (_pid, query) groups, not one/query
    assert "hashpartitioning(_pid" in plan
    rows = topk.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in rows)


def test_rank_limit_filter_gets_window_group_limit(spark):
    """Documents + pins the round-4 root-cause finding: Spark >= 3.5
    rewrites `row_number().over(partitionBy(q).orderBy(s)) <= k` into
    WindowGroupLimit Partial (map-side, BEFORE the exchange) + Final —
    which is why the pre-r4 single-window ANN rank never actually pushed
    a corpus through one task (tools/topk_bench.py measured parity with
    the explicit two-phase). If a Spark upgrade or conf change ever
    drops this rewrite, this test fires and the explicit topk_per_query
    becomes the only safe shape — at which point the A/B should be
    re-run."""
    from pyspark.sql import Window

    df = spark.range(100_000).select(
        (F.col("id") % 7).alias("query_id"),
        F.col("id").alias("n"),
        (F.col("id") % 997).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "n")
    ranked = df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)
    plan = plan_of(ranked)
    assert "WindowGroupLimit" in plan, plan
    # the Partial (pre-exchange) instance is the scale property: lines
    # print parent-first, so Partial must appear AFTER the Exchange line
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l and "Partial" in l]
    exch = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(query_id" in l]
    assert partial and exch and partial[0] > exch[0], plan


def test_undo_prior_join_broadcasts_under_cap(spark):
    """Review r05 pin: the undo-log prior join must broadcast the
    measured-small `replacing` side (the whole-table side must never
    shuffle for the undo save), and must NOT force a broadcast above the
    cap — a revert batch can carry millions of re-adjudicated urls
    regardless of the trigger's event count."""
    from gnarly_spark.streaming import pipeline as P

    tgt = spark.createDataFrame(
        [(f"u{i}", i, i) for i in range(200)],
        "url string, _replaced int, v int",
    ).select("url", "v")
    rep = spark.createDataFrame(
        [(f"u{i}", f"b{i}", i) for i in range(10)],
        "url string, _replaced_by_block string, _replaced_by_block_id long",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast so ONLY the explicit hint can produce a
        # BroadcastHashJoin — isolates the code path under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        under = P._undo_prior(tgt, rep, n_replacing=10)
        plan = under._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        over = P._undo_prior(tgt, rep, n_replacing=P._UNDO_BROADCAST_MAX_KEYS + 1)
        plan = over._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    got = {r.url for r in under.collect()}
    assert got == {f"u{i}" for i in range(10)}
