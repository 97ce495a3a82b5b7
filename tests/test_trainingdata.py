"""Semantic tests for dedup / similarity / text-analysis operators on
planted fixtures (the oracle-equivalence check runs via tools/check_oracle.py
and the driver's CORRECTNESS gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact dup of 0
        (2, base.replace("today", "tomorrow"), "en"),  # near dup of 0
        (3, "completely different words about spark shuffles and merges", "en"),
        (4, "  THE   quick brown fox jumps over the lazy dog again and again today ", "en"),  # dup after normalization
        (5, "der hund und die katze und das haus und der baum", "de"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string, lang string")


def test_exact_dedup_finds_planted(spark, docs):
    from gnarly_spark.operators.dedup import exact_duplicates

    got = exact_duplicates(docs).toPandas()
    dup_group = got[got.n_copies == 3]
    assert len(dup_group) == 1 and dup_group.iloc[0].keep_id == 0  # 0,1,4


def test_jaccard_finds_near_dup(spark, docs):
    from gnarly_spark.operators.dedup import jaccard_pairs

    got = jaccard_pairs(docs, threshold=0.5).toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    assert (0, 1) in pairs and (0, 4) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)
    exact = got[(got.id_a == 0) & (got.id_b == 1)].jaccard.iloc[0]
    assert exact == 1.0


def test_minhash_lsh_subset_of_jaccard_and_finds_dups(spark, docs):
    from gnarly_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    lsh = minhash_lsh_pairs(docs, k=8, bands=4, threshold=0.5).toPandas()
    jac = jaccard_pairs(docs, threshold=0.5).toPandas()
    lsh_pairs = set(map(tuple, lsh[["id_a", "id_b"]].values.tolist()))
    jac_pairs = set(map(tuple, jac[["id_a", "id_b"]].values.tolist()))
    assert lsh_pairs <= jac_pairs
    assert (0, 1) in lsh_pairs  # identical docs always collide in every band


def test_simhash_properties(spark, docs):
    from gnarly_spark.operators.dedup import simhash

    got = simhash(docs, bits=32).toPandas().set_index("id").simhash
    assert got[0] == got[1] == got[4]  # identical normalized text
    ham_near = bin(int(got[0]) ^ int(got[2])).count("1")
    ham_far = bin(int(got[0]) ^ int(got[5])).count("1")
    assert ham_near < ham_far


def test_boilerplate_scrub_strips_hot_lines_preserves_order(spark):
    from gnarly_spark.functions.text import line_dedup_stats, scrub_boilerplate

    rows = [
        (0, "cookie banner. alpha one. beta two. all rights reserved"),
        (1, "cookie banner. gamma three. all rights reserved"),
        (2, "cookie banner. delta four. epsilon five. all rights reserved"),
        (3, "cookie banner. all rights reserved"),  # fully boilerplate
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = (
        scrub_boilerplate(docs, min_docs=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0].clean_text == "alpha one. beta two" and got.loc[0].n_removed == 2
    assert got.loc[1].clean_text == "gamma three"
    assert got.loc[2].clean_text == "delta four. epsilon five"
    assert got.loc[3].clean_text == "" and got.loc[3].n_removed == 2
    census = line_dedup_stats(docs, min_docs=2).toPandas()
    assert set(census.n_docs) == {4}  # the two banners, each in all 4 docs
    assert len(census) == 2


def test_simhash_hamming_pairs_complete_vs_bruteforce(spark, docs):
    """Banded blocking (bands=4 > max_hamming=3) must recall EXACTLY the
    all-pairs answer (pigeonhole completeness), and identical docs must
    pair at hamming 0."""
    from gnarly_spark.operators.dedup import simhash, simhash_hamming_pairs

    got = simhash_hamming_pairs(docs, max_hamming=3, bands=4).toPandas()
    sig = simhash(docs, bits=32).toPandas().set_index("id").simhash
    brute = {
        (a, b): bin(int(sig[a]) ^ int(sig[b])).count("1")
        for a in sig.index
        for b in sig.index
        if a < b and bin(int(sig[a]) ^ int(sig[b])).count("1") <= 3
    }
    assert {(r.id_a, r.id_b): r.hamming for r in got.itertuples()} == brute
    assert brute[(0, 1)] == 0 and brute[(0, 4)] == 0  # exact dups


def test_simhash_64bit_pairs_complete_vs_bruteforce(spark, docs):
    """bits=64 — the setting simhash_hamming_pairs recommends for Hamming
    radius up to 7 — must (a) carry real signal in the high 32 bits (the
    token hash widens to 64 bits, not zero-padded), (b) encode bit 63 as
    Long.MIN_VALUE without a literal overflow, and (c) recall exactly the
    all-pairs answer under bands=8 blocking."""
    from gnarly_spark.operators.dedup import simhash, simhash_hamming_pairs

    sig = simhash(docs, bits=64).toPandas().set_index("id").simhash
    assert any(int(s) & (0xFFFFFFFF << 32) for s in sig)  # high word populated
    got = simhash_hamming_pairs(docs, max_hamming=7, bands=8, bits=64).toPandas()
    m = (1 << 64) - 1
    brute = {
        (a, b): bin((int(sig[a]) ^ int(sig[b])) & m).count("1")
        for a in sig.index
        for b in sig.index
        if a < b and bin((int(sig[a]) ^ int(sig[b])) & m).count("1") <= 7
    }
    assert {(r.id_a, r.id_b): r.hamming for r in got.itertuples()} == brute
    assert brute[(0, 1)] == 0 and brute[(0, 4)] == 0  # exact dups


def test_simhash_combination_blocking_complete_vs_bruteforce(spark, docs):
    """Manku combination blocking (b=6 blocks, key per C(6,3)=20 block
    combination) must recall EXACTLY the all-pairs answer at radius 3 —
    same completeness contract as disjoint bands, 2^32 keyspace instead of
    2^16. Also: both modes agree pair-for-pair."""
    from gnarly_spark.operators.dedup import (
        combination_key_bits,
        simhash,
        simhash_hamming_pairs,
    )

    # the 1e10-doc keyspace claim: b=6 gives 2^31 (uneven 64/6 blocks —
    # narrowest C(6,3) combo is 10+10+11 bits); b=7 crosses 2^32
    assert combination_key_bits(64, 6, 3) == 31
    assert combination_key_bits(64, 7, 3) >= 32
    sig = simhash(docs, bits=64).toPandas().set_index("id").simhash
    m = (1 << 64) - 1
    brute = {
        (a, b): bin((int(sig[a]) ^ int(sig[b])) & m).count("1")
        for a in sig.index
        for b in sig.index
        if a < b and bin((int(sig[a]) ^ int(sig[b])) & m).count("1") <= 3
    }
    combo = simhash_hamming_pairs(
        docs, max_hamming=3, bits=64, combination_blocks=6
    ).toPandas()
    assert {(r.id_a, r.id_b): r.hamming for r in combo.itertuples()} == brute
    disjoint = simhash_hamming_pairs(docs, max_hamming=3, bands=4, bits=64).toPandas()
    assert {(r.id_a, r.id_b): r.hamming for r in disjoint.itertuples()} == brute

    with pytest.raises(ValueError, match="combination_blocks"):
        simhash_hamming_pairs(docs, max_hamming=3, combination_blocks=3)


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(50, 16)).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(50), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    from gnarly_spark.operators.similarity import cosine_topk

    got = cosine_topk(df, [0, 1], k=3).toPandas()
    v = vecs.astype("float64")
    norm = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in (0, 1):
        s = sims[q].copy()
        s[q] = -np.inf
        expect = list(np.argsort(-np.round(s, 6), kind="stable")[:3])
        assert got[got.query_id == q].sort_values("rank").neighbor_id.tolist() == expect


def test_lsh_ann_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(300, 16)).astype("float32")
    # plant near-duplicates of queries so ANN has true positives to find
    for q in range(5):
        vecs[100 + q] = vecs[q] + rng.normal(scale=0.01, size=16).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    from gnarly_spark.operators.similarity import cosine_topk, lsh_ann_topk

    bf = cosine_topk(df, list(range(5)), k=1).toPandas()
    ann = lsh_ann_topk(df, list(range(5)), k=1, n_planes=6).toPandas()
    # the planted near-dup is each query's true top-1
    assert bf.sort_values("query_id").neighbor_id.tolist() == [100, 101, 102, 103, 104]
    hits = ann.merge(bf, on=["query_id", "neighbor_id"])
    assert len(hits) >= 4, f"ANN recall too low: {len(hits)}/5"


def test_text_functions(spark, docs):
    from gnarly_spark.functions.text import (
        bpe_ish_token_count,
        fingerprint,
        lang_id,
        token_count,
    )

    got = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("pred"),
        token_count(F.col("text")).alias("n"),
        bpe_ish_token_count(F.col("text")).alias("nb"),
        fingerprint(F.col("text")).alias("fp"),
    ).toPandas().set_index("doc_id")
    assert got.loc[0, "pred"] == "en" and got.loc[5, "pred"] == "de"
    assert got.loc[0, "n"] == 13
    assert got.loc[0, "fp"] == got.loc[1, "fp"] == got.loc[4, "fp"]
    assert got.loc[0, "fp"] != got.loc[2, "fp"]


def test_quality_score_ordering(spark, docs):
    from gnarly_spark.functions.text import quality_features

    got = quality_features(docs).toPandas().set_index("doc_id")
    assert (got.quality_score > 0).all()
    # stopword-rich English doc scores above the German one on the en-marker
    assert got.loc[0, "stopword_ratio"] > got.loc[5, "stopword_ratio"]


def test_winnow_fingerprints_robust_to_local_edit(spark):
    """An edit at the START of a doc must leave the tail fingerprints
    intact (the property whole-doc hashing lacks); identical docs share
    all fingerprints."""
    from gnarly_spark.operators.dedup import winnow_fingerprints

    body = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = spark.createDataFrame(
        [(0, body), (1, body), (2, "EDITED! " + body)],
        schema="doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=8, w=4).toPandas()
    sets = {i: set(fp[fp.id == i].fp) for i in (0, 1, 2)}
    assert sets[0] == sets[1]                      # deterministic
    overlap = len(sets[0] & sets[2]) / len(sets[0])
    assert overlap >= 0.7, overlap                 # local edit, mostly shared
    assert sets[0] != sets[2]                      # but the edit is visible


def test_duplicate_clusters_transitive(spark):
    """a-b and b-c pairs must land a,b,c in ONE cluster labeled min(id);
    disjoint pairs stay separate; chain length > 1 exercises >1 round of
    label propagation."""
    from gnarly_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11), (20, 21), (21, 20)],
        schema="id_a long, id_b long",
    )
    got = {
        r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_ivf_ann_recall(spark):
    """IVF (k-means coarse quantizer + n_probe) must hit decent recall of
    the exact brute-force top-k on the driver embeddings."""
    from gnarly_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=3).collect()
    approx = ivf_ann_topk(emb, qids, k=3, n_centroids=8, n_probe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, recall
    # every approx hit is a genuinely scored pair with rank <= 3
    assert all(1 <= r.rank <= 3 for r in approx)


def test_ivf_fixed_build_matches_python_reference(spark):
    """The fixed-point k-means build must be ENGINE-EXACT: an independent
    pure-Python replay (same quantize / Knuth init / integer distance /
    floor-division means) reproduces Spark's final assignment bit-for-bit.
    This is the property the DuckDB oracle relies on."""
    import math

    from gnarly_spark.operators.similarity import (
        FIXED_POINT_SCALE,
        ivf_build_fixed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {
        r.vec_id: [math.floor(float(x) * FIXED_POINT_SCALE + 0.5) for x in r.embedding]
        for r in rows
    }
    n_c, iters = 8, 3
    order = sorted(
        vecs, key=lambda i: (((i % 1000003) * 2654435761 + 1013904223) % 4294967296, i)
    )
    cents = {c: list(vecs[i]) for c, i in enumerate(order[:n_c])}

    def nearest(q):
        return min(
            cents, key=lambda c: (sum((a - b) ** 2 for a, b in zip(q, cents[c])), c)
        )

    assign = {}
    for _ in range(iters):
        assign = {i: nearest(q) for i, q in vecs.items()}
        for c in cents:
            members = [vecs[i] for i, ci in assign.items() if ci == c]
            if members:
                cents[c] = [
                    math.floor(sum(col) / len(members)) for col in zip(*members)
                ]
    expected = {i: nearest(q) for i, q in vecs.items()}

    _, got_df = ivf_build_fixed(emb, n_centroids=n_c, iterations=iters)
    got = {r.id: r.cluster for r in got_df.collect()}
    assert got == expected


def test_ivf_fixed_ann_recall(spark):
    """The hash-checkable fixed-point IVF keeps useful recall vs exact
    brute force (and returns well-formed ranks)."""
    from gnarly_spark.operators.similarity import cosine_topk, ivf_ann_topk_fixed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=3).collect()
    approx = ivf_ann_topk_fixed(emb, qids, k=3, n_centroids=8, n_probe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.5
    assert all(1 <= r.rank <= 3 for r in approx)


def test_semantic_dedup_planted_dup_and_precision(spark):
    """SemDeDup: an exact duplicate vector ALWAYS pairs with its original
    (identical quantized vectors get identical cluster assignments), and
    every emitted pair is a true >= threshold pair (exact precision —
    clustering only limits recall, never correctness)."""
    from gnarly_spark.operators.similarity import (
        cosine,
        semantic_dedup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v0 = emb.where("vec_id = 0").select("embedding").first()[0]
    planted = spark.createDataFrame(
        [(9000, v0, 0)], schema="vec_id long, embedding array<float>, label int"
    )
    corpus = emb.unionByName(planted)
    pairs = semantic_dedup_pairs(
        corpus, threshold=0.35, n_centroids=4, iterations=2
    ).collect()
    assert (0, 9000) in {(r.id_a, r.id_b) for r in pairs}
    assert all(r.cos >= 0.35 for r in pairs)
    # precision vs brute force: every pair really scores >= threshold
    brute = {
        (r.id_a, r.id_b)
        for r in corpus.alias("a")
        .join(corpus.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                cosine(
                    F.transform("a.embedding", lambda x: x.cast("double")),
                    F.transform("b.embedding", lambda x: x.cast("double")),
                ),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= 0.35)
        .collect()
    }
    assert {(r.id_a, r.id_b) for r in pairs} <= brute


def test_neardup_lsh_subset_of_bruteforce_and_finds_planted(spark):
    """Banded LSH near-dup: exact precision (every pair is a true
    >=threshold pair from the brute-force relation) and identical vectors
    are ALWAYS found (they share every band). max_bucket caps degenerate
    buckets without losing the planted pair."""
    from gnarly_spark.operators.similarity import neardup_pairs, neardup_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant an exact duplicate of vec 0 under a fresh id
    v0 = emb.where("vec_id = 0").select("embedding").first()[0]
    planted = spark.createDataFrame(
        [(9000, v0, 0)], schema="vec_id long, embedding array<float>, label int"
    )
    corpus = emb.unionByName(planted)
    brute = {
        (r.id_a, r.id_b): r.cos
        for r in neardup_pairs(corpus, threshold=0.35).collect()
    }
    lsh = neardup_pairs_lsh(corpus, threshold=0.35, n_planes=16, bands=4).collect()
    assert lsh, "LSH near-dup found nothing"
    for r in lsh:
        assert (r.id_a, r.id_b) in brute, (r.id_a, r.id_b)
        assert abs(brute[(r.id_a, r.id_b)] - r.cos) < 1e-9
    assert (0, 9000) in {(r.id_a, r.id_b) for r in lsh}
    capped = neardup_pairs_lsh(
        corpus, threshold=0.35, n_planes=16, bands=4, max_bucket=50
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} <= {(r.id_a, r.id_b) for r in lsh}


def test_hot_shingle_cap_bounds_candidate_pairs(spark):
    """A stop-shingle shared by every doc makes the Jaccard self-join
    quadratic; cap_hot_shingles must collapse the candidate-pair relation
    to the real duplicates while keeping exact dups findable."""
    from gnarly_spark.operators.dedup import (
        cap_hot_shingles,
        jaccard_pairs,
        shingles,
    )

    hot = "of the and"
    rows = [
        (i, f"{hot} filler " + " ".join(f"w{i}x{j}" for j in range(6)))
        for i in range(40)
    ]
    rows.append((100, rows[0][1]))  # planted exact dup of doc 0
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")

    def n_candidate_pairs(sh):
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .distinct()
            .count()
        )

    sh = shingles(docs)
    capped = cap_hot_shingles(sh, max_doc_freq=5)
    assert capped.where(F.col("shingle") == hot).count() == 0
    assert n_candidate_pairs(sh) == 41 * 40 // 2  # every pair collides
    assert n_candidate_pairs(capped) == 1  # only the planted dup
    got = jaccard_pairs(docs, threshold=0.9, max_doc_freq=5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(0, 100, 1.0)]


def test_duplicate_clusters_raises_on_nonconvergence(spark):
    """A chain whose diameter exceeds max_iterations must raise, not return
    silently-split clusters (divergence from the transitive-closure
    oracle)."""
    from gnarly_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], schema="id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(chain, max_iterations=2)
    ok = duplicate_clusters(chain, max_iterations=25).collect()
    assert {r.cluster_id for r in ok} == {1}


def test_decontaminate_flags_benchmark_overlap(spark, docs):
    """Docs sharing a 3-gram with the benchmark set are contaminated;
    unrelated docs get n_hits=0; benchmark docs themselves are excluded."""
    from gnarly_spark.operators.dedup import decontaminate

    bench = docs.where(F.col("doc_id") == 0)       # the fox sentence
    corpus = docs.where(F.col("doc_id") != 0)
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(corpus, bench).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1][1] and got[4][1]                  # exact dups: all shingles hit
    assert got[2][1] and got[2][0] < got[1][0]      # near dup: fewer shared
    assert got[3] == (0, False) and got[5] == (0, False)


def test_decontaminate_plan_broadcasts_benchmark(spark, docs):
    """The benchmark shingle set must broadcast — the corpus side is never
    shuffled on the shingle (the 100 TB shape)."""
    from gnarly_spark.operators.dedup import decontaminate

    out = decontaminate(docs.where(F.col("doc_id") != 0), docs.where(F.col("doc_id") == 0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quantize_vectors_roundtrip_and_zero_guard(spark):
    from gnarly_spark.operators.similarity import quantize_vectors

    emb = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        schema="vec_id long, embedding array<float>",
    )
    rows = {r.id: r for r in quantize_vectors(emb).collect()}
    # dequantized values within scale/2 of the original (round-to-nearest)
    r0 = rows[0]
    orig = [0.5, -1.0, 0.25, 0.0]
    for q, x in zip(r0.qvec, orig):
        # a tie (x/scale ends in .5) rounds up: error is exactly scale/2
        assert abs(q * r0.scale - x) <= r0.scale / 2 + 1e-7
    assert max(abs(q) for q in r0.qvec) == 127
    assert rows[1].scale == 0.0 and rows[1].qvec == [0, 0, 0, 0]  # zero vector


def test_pack_sequences_respects_budget(spark):
    from gnarly_spark.catalog_training import text_pack_sequences

    out = text_pack_sequences(spark, "/root/testdata/sf0.001").toPandas()
    # no pack exceeds the budget unless a single doc alone does
    sums = out.groupby("pack_id").agg(total=("n_tok", "sum"), n=("doc_id", "count"))
    over = sums[(sums.total > 2048) & (sums.n > 1)]
    # a multi-doc pack may only exceed budget by its LAST doc (first-fit:
    # a doc is placed in the pack where its start offset falls)
    assert (out.n_tok > 0).all()
    for pid in over.index:
        docs_in = out[out.pack_id == pid].sort_values("doc_id")
        assert docs_in.n_tok.iloc[:-1].sum() <= 2048


def test_hot_band_cap_bounds_candidates_keeps_cool_pairs(spark):
    """A synthetic hot band (60 template-identical docs -> every band
    bucket holds all 60) must be dropped by max_band_bucket: the O(n^2)
    template pairs vanish while a planted near-dup pair in a cool bucket
    survives — in BOTH banded operators (minhash LSH and simhash)."""
    from gnarly_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_hamming_pairs,
    )

    template = [(i, "breaking news site boilerplate footer nav bar") for i in range(60)]
    planted = [
        (100, "unique quantum entanglement research results alpha beta"),
        (101, "unique quantum entanglement research results alpha gamma"),
    ]
    docs = spark.createDataFrame(template + planted, "doc_id long, text string")

    for fn, kw in (
        (minhash_lsh_pairs, dict(k=8, bands=4, threshold=0.5)),
        (simhash_hamming_pairs, dict(max_hamming=3, bands=4, bits=32)),
    ):
        uncapped = fn(docs, **kw).toPandas()
        assert len(uncapped) >= 60 * 59 / 2, fn.__name__  # template pairs
        capped = fn(docs, max_band_bucket=10, **kw).toPandas()
        got = {(r.id_a, r.id_b) for r in capped.itertuples()}
        assert (100, 101) in got, f"{fn.__name__}: cool pair lost"
        assert not any(a < 60 and b < 60 for a, b in got), (
            f"{fn.__name__}: hot-bucket pairs must be dropped by the cap"
        )


def test_bpe_count_matches_hand_tokenization(spark):
    """bpe_token_count applies merges in rank order, one non-overlapping
    left-to-right pass each — checked against hand-derived tokenizations,
    including cascading merges and the overlap case."""
    from gnarly_spark.functions.text import bpe_token_count

    merges = [("t", "h"), ("th", "e"), ("l", "l")]
    rows = [
        (0, "the"),        # t h e -> th e -> the        = 1
        (1, "thethe"),     # -> the the                  = 2
        (2, "hello"),      # h e ll o                    = 4
        (3, "llll"),       # ll ll (non-overlapping)     = 2
        (4, "lll"),        # ll l (leftmost first)       = 2
        (5, "x theta"),    # x | the t a                 = 1 + 3
        (6, ""),           # empty                        = 0
        (7, None),
        (8, "THE  Lll"),   # normalize: 'the lll' -> 1 + 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_token_count(df, merges).toPandas().set_index("id").n_tok
    assert got.to_dict() == {0: 1, 1: 2, 2: 4, 3: 2, 4: 2, 5: 4, 6: 0, 7: 0, 8: 3}


def test_bpe_trainer_learns_corpus_merges(spark):
    """train_bpe_merges on a skewed corpus must learn the dominant pair
    first, rank-properly (every merge's parts exist before it), and
    deterministically; counting with the learned merges compresses the
    dominant word to ~1 token."""
    from gnarly_spark.functions.text import bpe_token_count, train_bpe_merges

    rows = [(i, "sparkly " * 5) for i in range(40)] + [
        (100 + i, "rare words here") for i in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_merges(df, n_merges=8)
    assert merges == train_bpe_merges(df, n_merges=8)  # deterministic
    built = {"".join(p) for p in merges} | set("abcdefghijklmnopqrstuvwxyz")
    for a, b in merges:
        assert a in built and b in built  # rank-proper
    n = bpe_token_count(df.where("doc_id = 0"), merges).head().n_tok
    assert n <= 2 * 5  # 'sparkly' (7 chars) compressed to <= 2 tokens


def test_bpe_tokenize_stream_and_roundtrip(spark):
    """bpe_tokenize emits the ordered sub-word stream; concatenating a
    word's pieces reproduces the word exactly (lossless segmentation)."""
    from gnarly_spark.functions.text import bpe_tokenize

    merges = [("t", "h"), ("th", "e"), ("l", "l")]
    df = spark.createDataFrame(
        [(0, "the hello"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = bpe_tokenize(df, merges).toPandas()
    assert got[got.id == 0].sort_values("pos").token.tolist() == [
        "the", "h", "e", "ll", "o",
    ]
    assert got[got.id == 0].pos.tolist() == [1, 2, 3, 4, 5]
    assert (got.id != 1).all() and (got.id != 2).all()  # empty/null: no rows
    # lossless: pieces rejoin to the normalized text
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    stream = bpe_tokenize(docs, merges)
    rejoined = (
        stream.orderBy("id", "pos")
        .groupBy("id")
        .agg(F.concat_ws("", F.collect_list("token")).alias("j"))
    )
    from gnarly_spark.operators.dedup import normalize_text

    want = docs.select(
        F.col("doc_id").alias("id"),
        F.replace(normalize_text(F.col("text")), F.lit(" "), F.lit("")).alias("w"),
    )
    assert rejoined.join(want, "id").where("j <> w").count() == 0


def test_repeated_spans_planted_run(spark):
    """A 12-word run shared verbatim by two docs at DIFFERENT offsets is
    flagged at exactly the 3 window starts inside the run in each doc
    (span=10); a unique doc contributes nothing; an in-doc repeat does
    not clear min_docs=2 (distinct docs, not occurrences)."""
    from gnarly_spark.operators.dedup import repeated_spans

    run = " ".join(f"shared{i}" for i in range(12))
    rows = [
        (0, " ".join(f"a{i}" for i in range(5)) + " " + run + " a5 a6 a7"),
        (1, run + " " + " ".join(f"b{i}" for i in range(8))),
        (2, " ".join(f"c{i}" for i in range(30))),
        # doc 3 repeats ITS OWN 10-gram twice — only 1 distinct doc
        (3, " ".join(f"d{i}" for i in range(10)) + " x " + " ".join(f"d{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = repeated_spans(df, span=10, min_docs=2).toPandas()
    assert set(got.n_docs) == {2}
    flagged = {(r.doc_id, r.pos) for r in got.itertuples()}
    assert flagged == {(0, 6), (0, 7), (0, 8), (1, 1), (1, 2), (1, 3)}, flagged


def test_strip_repeated_spans_keeper_and_union(spark):
    """Span REMOVAL: the smallest-id doc sharing a span keeps its text
    verbatim; the other doc loses the UNION of its flagged intervals
    (3 overlapping 10-token windows -> one 12-token cut, not 30);
    unflagged docs and empty docs pass through with n_removed=0."""
    from gnarly_spark.operators.dedup import normalize_text, strip_repeated_spans

    run = " ".join(f"shared{i}" for i in range(12))
    rows = [
        (0, " ".join(f"a{i}" for i in range(5)) + " " + run + " a5 a6 a7"),
        (1, run + " " + " ".join(f"b{i}" for i in range(8))),
        (2, " ".join(f"c{i}" for i in range(30))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = strip_repeated_spans(df, span=10, min_docs=2).toPandas().set_index("doc_id")
    norm = {
        r.doc_id: r.n
        for r in df.select("doc_id", normalize_text(F.col("text")).alias("n")).collect()
    }
    assert got.loc[0, "n_removed"] == 0 and got.loc[0, "clean_text"] == norm[0]
    # doc 1: windows at pos 1,2,3 union to tokens 1..12 -> only the b-words stay
    assert got.loc[1, "n_removed"] == 12
    assert got.loc[1, "clean_text"] == " ".join(f"b{i}" for i in range(8))
    assert got.loc[2, "n_removed"] == 0 and got.loc[2, "clean_text"] == norm[2]
    assert got.loc[3, "n_removed"] == 0 and got.loc[3, "clean_text"] == ""


def test_pack_sequences_bpe_budget_mode(spark):
    """pack_sequences(merges=...) budgets on REAL BPE counts: same
    first-fit invariants as whitespace mode, and n_tok comes from the
    tokenizer (sub-word counts exceed word counts)."""
    from gnarly_spark.catalog_training import _BPE_MERGES
    from gnarly_spark.functions.text import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=2048, merges=_BPE_MERGES).toPandas()
    ws = pack_sequences(docs, budget=2048).toPandas().set_index("doc_id")
    got = out.set_index("doc_id")
    assert (got.n_tok >= ws.n_tok).all()  # sub-word >= whitespace words
    sums = out.groupby("pack_id").agg(total=("n_tok", "sum"), n=("doc_id", "count"))
    for pid in sums[(sums.total > 2048) & (sums.n > 1)].index:
        docs_in = out[out.pack_id == pid].sort_values("doc_id")
        assert docs_in.n_tok.iloc[:-1].sum() <= 2048


def test_write_shards_sorted_balanced_deterministic(spark, tmp_path):
    """Sharded training export: every doc lands in exactly one shard,
    rows inside every shard FILE are sorted by sort_key (the data loader
    reads sequentially), shards are roughly balanced, and the permutation
    is a pure function of (salt, doc_id) — same salt reproduces it, a new
    salt moves docs."""
    import pyarrow.parquet as pq

    from gnarly_spark.functions.text import shard_assign, write_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards=8)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    sizes = {r.shard: r.n for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 8
    assert max(sizes.values()) <= 3 * min(sizes.values()), sizes
    # per-file physical sort: the loader contract
    import glob

    for f in glob.glob(f"{out}/shard=*/*.parquet"):
        keys = pq.read_table(f, columns=["sort_key"])["sort_key"].to_pylist()
        assert keys == sorted(keys), f
    a1 = {r.doc_id: (r.shard, r.sort_key) for r in shard_assign(docs, 8).collect()}
    a2 = {r.doc_id: (r.shard, r.sort_key) for r in shard_assign(docs, 8).collect()}
    assert a1 == a2
    a3 = {r.doc_id: (r.shard, r.sort_key) for r in shard_assign(docs, 8, salt="7").collect()}
    assert a3 != a1


def test_incremental_lsh_flags_batch_dup_of_corpus(spark, docs):
    """An incoming batch doc that duplicates a corpus doc is flagged with
    est_jaccard 1.0; an unrelated batch doc produces no row; corpus-vs-
    corpus pairs never appear (only new_id from the batch)."""
    from gnarly_spark.operators.dedup import incremental_lsh_dups, minhash_signatures

    corpus = docs.where(F.col("doc_id").isin(0, 3, 5))
    batch = docs.where(F.col("doc_id").isin(1, 2))  # dup + near-dup of 0
    got = incremental_lsh_dups(batch, minhash_signatures(corpus)).collect()
    pairs = {(r.new_id, r.dup_of): r.est_jaccard for r in got}
    assert pairs[(1, 0)] == 1.0                      # exact dup: all k agree
    assert all(new_id in (1, 2) for new_id, _ in pairs)
    assert all(dup_of in (0, 3, 5) for _, dup_of in pairs)


def test_collapse_repeat_tokens(spark):
    from gnarly_spark.functions.text import collapse_repeat_tokens

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "x y x y"), (2, "solo")],
        schema="doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in collapse_repeat_tokens(docs).collect()}
    assert got[0] == ("a b c", 3)
    assert got[1] == ("x y x y", 0)  # non-consecutive repeats survive
    assert got[2] == ("solo", 0)


def test_scrub_pii_digit_run_boundaries(spark):
    """The digit rule counts DIGITS (>= 7), not characters: 6-digit values
    (dates, postal codes) survive; 7+ digits are masked plain or with one
    [ .-] between each pair; double separators break the run."""
    from gnarly_spark.functions.text import scrub_pii

    rows = [
        ("date 202408 end", "date 202408 end"),          # 6 digits: kept
        ("id 1234567 end", "id <NUMBER> end"),           # 7 digits: masked
        ("tel 555-123-4567 end", "tel <NUMBER> end"),    # 10 digits, dashed
        ("a 1 2 3 4 5 6 7 b", "a <NUMBER> b"),           # 7 spaced digits
        ("x 123  4567890 y", "x 123  <NUMBER> y"),       # double space splits
        ("mail bob@x.org now", "mail <EMAIL> now"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t string")
    got = [r.s for r in df.select(scrub_pii("t").alias("s")).collect()]
    assert got == [w for _, w in rows]


def test_shingles_short_null_and_empty_docs(spark):
    """Docs with fewer than n words (incl. empty and NULL text) yield NO
    shingles — matching the SQL oracles — instead of crashing element_at
    (sequence(0,-1) is [0,-1], not empty). Reachable from the streaming
    dedup path, whose short-text contract is 'no signature', not 'job
    dies'."""
    from gnarly_spark.operators.dedup import jaccard_pairs, minhash_signatures, shingles

    docs = spark.createDataFrame(
        [(1, "only two"), (2, None), (3, ""), (4, "exactly three words"),
         (5, "a much longer document with plenty of words here"),
         (6, "a much longer document with plenty of words here")],
        "doc_id long, text string",
    )
    sh = shingles(docs).toPandas()
    assert sorted(sh.id.unique()) == [4, 5, 6]
    assert len(sh[sh.id == 4]) == 1  # exactly-n-words doc: one shingle
    assert sorted(minhash_signatures(docs, k=4).toPandas().id) == [4, 5, 6]
    pairs = jaccard_pairs(docs, threshold=0.9).toPandas()
    assert list(zip(pairs.id_a, pairs.id_b)) == [(5, 6)]


def test_lsh_sketch_rejects_empty_corpus(spark):
    from gnarly_spark.operators.similarity import lsh_sketch

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        lsh_sketch(empty)


def test_mixture_sample_clamp_nested_keepsets_and_plan(spark):
    """mixture_sample: (1) a source whose target exceeds its tokens keeps
    EVERYTHING (clamp); (2) keep-sets are nested when a source's rate
    falls (hash-threshold rule — no reshuffle on rebalance); (3) the
    corpus side is filtered via a broadcast join, never shuffled."""
    import hashlib

    from gnarly_spark.catalog_training import mixture_sample

    rows = [(i, "hot" if i % 4 == 0 else "tail", 100) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    wt = F.when(F.col("source") == "hot", F.lit(8)).otherwise(F.lit(1))

    kept = mixture_sample(docs, wt).select("doc_id", "source", "clamped").collect()
    hot = [r for r in kept if r.source == "hot"]
    # hot: tok=10000, W=9, B=20000 -> target 8*20000/9 > 10000 => clamped
    assert len(hot) == 100 and all(r.clamped for r in hot)
    tail_keep = {r.doc_id for r in kept if r.source == "tail"}
    # tail rate = 20000/(9*30000) ~ 0.074: sampled, not clamped, nonempty
    assert 0 < len(tail_keep) < 300

    # independent check of the integer acceptance rule for tail docs
    def u32(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)

    expect = {
        i for (i, s, _) in rows if s == "tail"
        and u32(i) * 30000 * 9 < 1 * 20000 * 4294967296
    }
    assert tail_keep == expect

    # nested keep-sets: halving the budget must keep a SUBSET of tail docs
    halved = mixture_sample(docs, wt, budget_num=1, budget_den=4)
    tail_half = {r.doc_id for r in halved.collect() if r.source == "tail"}
    assert tail_half < tail_keep

    plan = (
        mixture_sample(docs, wt)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus relation reaches the join without an exchange on its side
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_inverted_index_postings_and_bands(spark):
    from gnarly_spark.functions.text import inverted_index

    d = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog sat"),
            (3, "the cat ran"),
        ],
        "doc_id long, text string",
    )
    idx = {r.token: (r.doc_freq, r.postings) for r in inverted_index(d).collect()}
    assert idx["the"] == (3, "1,2,3")
    assert idx["cat"] == (2, "1,3")
    assert idx["dog"] == (1, "2")
    # min_df drops hapax, max_df caps the stopword out of the index
    banded = {
        r.token for r in inverted_index(d, min_df=2, max_df=2).collect()
    }
    assert banded == {"cat", "sat"}


def test_tfidf_search_scores_and_membership(spark):
    import math

    from gnarly_spark.functions.text import tfidf_search

    d = spark.createDataFrame(
        [
            (1, "spark spark spark flink"),
            (2, "spark flink flink"),
            (3, "duckdb only here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.score, r.n_terms) for r in
           tfidf_search(d, ["spark", "flink"]).collect()}
    assert set(got) == {1, 2}  # doc 3 matches no term
    idf = math.log(3 / 2)  # both terms appear in 2 of 3 docs
    assert got[1] == (round(3 * idf + 1 * idf, 6), 2)
    assert got[2] == (round(1 * idf + 2 * idf, 6), 2)


def test_gopher_repetition_hand_computed(spark):
    """'the cat sat on the cat sat on the mat': 9 bigrams, 5 distinct ->
    dup2 = 4/9, top2 = 2/9; 8 trigrams, 5 distinct -> dup3 = 3/8,
    top3 = 2/8. Docs shorter than n get 0 for both signals (and a
    one-bigram doc has top2 = 1.0 by definition)."""
    from gnarly_spark.functions.text import gopher_repetition

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the cat sat on the mat"),
            (2, "a b"),
            (3, "x"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert (got[1].dup2, got[1].top2) == (
        round(4 / 9, 6),
        round(2 / 9, 6),
    )
    assert (got[1].dup3, got[1].top3) == (0.375, 0.25)
    assert (got[2].dup2, got[2].top2, got[2].dup3) == (0.0, 1.0, 0.0)
    assert (got[3].dup2, got[3].top2) == (0.0, 0.0)
    assert (got[4].dup2, got[4].top3) == (0.0, 0.0)


def test_unigram_surprisal_hand_computed(spark):
    """Corpus 'a a b' + 'a c': N=5, c(a)=3 -> s = floor(log2(5 div 3)) = 0,
    c(b)=c(c)=1 -> s = floor(log2(5)) = 2. Doc scores 2/3 and 1.0; empty
    and null docs score 0 with 0 tokens."""
    from gnarly_spark.functions.text import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "A  a b"), (2, "a c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert (got[1].n_tokens, got[1].surprisal) == (3, round(2 / 3, 6))
    assert (got[2].n_tokens, got[2].surprisal) == (2, 1.0)
    assert (got[3].n_tokens, got[3].surprisal) == (0, 0.0)
    assert (got[4].n_tokens, got[4].surprisal) == (0, 0.0)


def test_bigram_surprisal_hand_computed(spark):
    """Corpus 'a b a b c' + 'a b x' + 'z': N=9, cu(a)=cu(b)=3, cu(c/x/z)=1.
    Only bigram (a,b) reaches min_count=2 (count 3) -> seen score
    floor(log2(cu(a) div 3)) = 0; every other transition backs off to
    floor(log2(N div cu(cur))) + 1: cur=a/b -> 2, cur=c/x -> 4. Doc1's
    transitions (a,b)(b,a)(a,b)(b,c) score 0+2+0+4 = 6/4; doc2's
    (a,b)(b,x) = 0+4 = 4/2; single-token/empty/null docs -> 0."""
    from gnarly_spark.functions.text import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "A  b a b c"), (2, "a b x"), (3, "z"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert (got[1].n_transitions, got[1].surprisal, got[1].backoff_frac) == (
        4, 1.5, 0.5,
    )
    assert (got[2].n_transitions, got[2].surprisal, got[2].backoff_frac) == (
        2, 2.0, 0.5,
    )
    for d in (3, 4, 5):
        assert (got[d].n_transitions, got[d].surprisal, got[d].backoff_frac) == (
            0, 0.0, 0.0,
        )


def test_bigram_surprisal_min_count_one_never_backs_off(spark):
    """Self-scoring with min_count=1: every doc bigram exists in the
    corpus at least once, so backoff can never fire (the degenerate case
    the default min_count=2 exists to avoid)."""
    from gnarly_spark.functions.text import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "p q r"), (2, "q r s")], "doc_id long, text string"
    )
    out = bigram_surprisal(df, min_count=1).collect()
    assert all(r.backoff_frac == 0.0 for r in out)


def test_chunk_passages_windows_and_edges(spark):
    """10 tokens, chunk 4, stride 3 -> starts 0,3,6 cover all tokens with
    1-token overlap; last chunk full here, short tail when n=9; short doc
    -> itself; empty/null -> no chunks."""
    from gnarly_spark.functions.text import chunk_passages

    ten = " ".join(f"t{i}" for i in range(10))
    nine = " ".join(f"t{i}" for i in range(9))
    df = spark.createDataFrame(
        [(1, ten), (2, "a b"), (3, ""), (4, None), (5, nine)],
        "doc_id long, text string",
    )
    out = chunk_passages(df, chunk_tokens=4, stride=3)
    got = {
        (r.id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in out.collect()
    }
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, "t6 t7 t8 t9")
    assert got[(2, 0)] == (2, "a b")  # short doc: one chunk, itself
    assert not any(k[0] in (3, 4) for k in got)
    assert got[(5, 2)] == (3, "t6 t7 t8")  # short tail chunk
    # every token of doc 1 appears in some chunk (coverage)
    covered = " ".join(got[(1, i)][1] for i in range(3)).split()
    assert set(covered) == {f"t{i}" for i in range(10)}


def test_exact_dedup_null_texts_are_not_copies_of_each_other(spark):
    """Distinct docs that merely LACK text (html-only pages whose extracted
    text is NULL) must not collapse into one NULL-fingerprint duplicate
    group — a keep-only-keep_id caller would silently delete all but one."""
    from gnarly_spark.operators.dedup import exact_duplicates

    d = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text")], "doc_id long, text string"
    )
    got = exact_duplicates(d).toPandas()
    assert got.fingerprint.notna().all()
    assert got.n_copies.tolist() == [1]  # only the real-text group remains


def test_lm_quality_keeps_null_and_empty_docs(spark):
    """Every input doc gets a row (NULL score, 0 tokens for NULL/empty
    text), and the '' pseudo-token from split('') must not enter the vocab
    or score anything."""
    from gnarly_spark.functions.text import lm_quality

    d = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = lm_quality(d).toPandas().set_index("doc_id").sort_index()
    assert got.index.tolist() == [1, 2, 3]
    assert got.loc[1, "n_tokens"] == 2 and got.loc[1, "lm_score"] > 0
    assert got.loc[2, "n_tokens"] == 0 and pd.isna(got.loc[2, "lm_score"])
    assert got.loc[3, "n_tokens"] == 0 and pd.isna(got.loc[3, "lm_score"])


def test_pack_sequences_empty_doc_is_zero_tokens(spark):
    from gnarly_spark.functions.text import pack_sequences

    d = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "", "s"), (3, "   ", "s"), (4, None, "s")],
        "doc_id long, text string, source string",
    )
    got = pack_sequences(d).toPandas().set_index("doc_id").n_tok
    assert got.loc[1] == 3
    assert got.loc[2] == 0 and got.loc[3] == 0 and got.loc[4] == 0


def test_pack_sequences_rejects_string_ids_loudly(spark):
    from gnarly_spark.functions.text import pack_sequences

    d = spark.createDataFrame(
        [("http://a", "x y", "s")], "doc_id string, text string, source string"
    )
    with pytest.raises(TypeError, match="numeric"):
        pack_sequences(d)


def test_inverted_index_no_empty_token_row(spark):
    from gnarly_spark.functions.text import inverted_index

    d = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "cat dog"), (4, "cat")], "doc_id long, text string"
    )
    idx = {r.token: (r.doc_freq, r.postings) for r in inverted_index(d).collect()}
    assert "" not in idx
    assert idx["cat"] == (2, "3,4")


def test_semdedup_incremental_reingested_id_not_its_own_dup(spark):
    """A re-crawled vector whose id already exists in the corpus must not
    be flagged as a duplicate of itself (cos=1.0 against its own prior
    version) — the same c.id != b.id guard incremental_lsh_dups applies."""
    from gnarly_spark.operators.similarity import semantic_dedup_incremental

    rows = [
        (1, [1.0, 0.0, 0.0, 0.1]),
        (2, [0.99, 0.01, 0.0, 0.1]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    batch = corpus.where(F.col("vec_id") == 1)  # re-ingest of corpus id 1
    got = semantic_dedup_incremental(
        batch, corpus, threshold=0.9, n_centroids=2, iterations=1
    ).toPandas()
    assert not ((got.new_id == got.dup_of)).any()
    assert set(map(tuple, got[["new_id", "dup_of"]].values.tolist())) == {(1, 2)}


def test_dsir_weights_match_python_reference_and_rank_target(spark):
    """dsir_weights is bit-identical to a direct Python evaluation of the
    integer formula, and a raw doc written in the target domain's
    vocabulary outweighs an off-domain one."""
    import hashlib
    from collections import Counter

    from gnarly_spark.functions.text import dsir_weights

    rows = [
        # target exemplars: "science" vocabulary
        (0, "the cell divides and the protein folds in the cell", True),
        (1, "the protein folds and the cell divides again", True),
        # raw, target-like
        (2, "the cell divides while the protein folds", False),
        # raw, off-domain
        (3, "buy cheap pills now click here buy now", False),
        # degenerate
        (4, "one", False),
        (5, "", False),
    ]
    m, sb = 1024, 20
    grams = []
    for i, text, tgt in rows:
        w = [x for x in text.split(" ") if x]
        for a, b in zip(w, w[1:]):
            k = int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % m
            grams.append((i, tgt, k))
    cnt_r = Counter(k for _, _, k in grams)
    cnt_t = Counter(k for _, g, k in grams if g)
    big_r, big_t = len(grams), sum(1 for _, g, _ in grams if g)
    c = ((big_r + m) << sb) // (big_t + m)
    lam = {
        k: max(((cnt_t.get(k, 0) + 1) * c) // (cnt_r[k] + 1), 1).bit_length()
        - 1
        - sb
        for k in cnt_r
    }
    want = {}
    for i, text, tgt in rows:
        w = [x for x in text.split(" ") if x]
        ks = [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % m
            for a, b in zip(w, w[1:])
        ]
        want[i] = (len(ks), sum(lam[k] for k in ks))

    df = spark.createDataFrame(
        [(i, t, g) for i, t, g in rows], "doc_id long, text string, tgt boolean"
    )
    out = dsir_weights(df, F.col("tgt"), n_buckets=m, scale_bits=sb)
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"]) for r in out.collect()
    }
    assert got == want
    assert got[4] == (0, 0) and got[5] == (0, 0)
    assert got[2][1] > got[3][1], "target-like doc must outweigh off-domain"


def test_dsir_plan_broadcasts_lambda_no_python(spark):
    from gnarly_spark.functions.text import dsir_weights

    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "c d e", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = dsir_weights(df, F.col("tgt"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dsir_stats_reducer_incremental_matches_batch(spark, tmp_path):
    """Drain a changelog through the pipeline in 3 micro-batches (one
    refired): folded per-batch DSIR stats must equal one-shot
    dsir_bucket_stats over all insert/update pages, and scoring with the
    incremental lam table must equal the one-corpus dsir_weights."""
    import pandas as pd

    from gnarly_spark.fixtures import CHANGELOG_DDL
    from gnarly_spark.functions.text import (
        dsir_bucket_stats,
        dsir_lam,
        dsir_score,
        dsir_stats_read,
        dsir_stats_reducer,
        dsir_weights,
    )
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    texts = [
        ("the cell divides and the protein folds", "en"),
        ("buy cheap pills now buy now", "xx"),
        ("the protein folds in the cell again", "en"),
        ("", "en"),                      # no grams
        ("cheap pills cheap pills", "xx"),
        ("the cell divides again", "en"),
    ]

    def ev(seq, op, text, lang):
        return dict(
            op_seq=seq, block_id=seq // 2, block_hash=str(seq // 2),
            parent_hash=str(seq // 2 - 1), op=op,
            url=f"https://s{seq}.example/p",
            warc_ts=pd.Timestamp("2024-03-01") + pd.Timedelta(seconds=seq),
            html=text.encode(), lang=lang,
            revert_of_block=None, reason=None,
        )

    rows = [
        ev(i, "insert" if i != 3 else "delete", t, lg)
        for i, (t, lg) in enumerate(texts)
    ]
    log = pd.DataFrame(rows)
    red = dsir_stats_reducer(is_target=F.col("lang") == "en", n_buckets=64)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=[red])
    for i, lo in enumerate(range(0, 6, 2)):
        p.process_batch(
            spark.createDataFrame(log.iloc[lo:lo + 2], schema=CHANGELOG_DDL), i
        )
    p.process_batch(  # refire: batch-path guard must no-op
        spark.createDataFrame(log.iloc[2:4], schema=CHANGELOG_DDL), 1
    )

    crawled = spark.createDataFrame(
        [
            (f"https://s{i}.example/p", t, lg == "en")
            for i, (t, lg) in enumerate(texts)
            if i != 3  # the delete never contributed
        ],
        "doc_id string, text string, tgt boolean",
    )
    inc = {
        r["k"]: (r["cnt_r"], r["cnt_t"])
        for r in dsir_stats_read(red, p).collect()
    }
    direct = {
        r["k"]: (r["cnt_r"], r["cnt_t"])
        for r in dsir_bucket_stats(crawled, F.col("tgt"), 64).collect()
    }
    assert inc == direct and inc, "incremental stats != one-shot stats"

    lam = dsir_lam(dsir_stats_read(red, p), 64)
    inc_scores = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"])
        for r in dsir_score(crawled, lam, 64).collect()
    }
    full_scores = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"])
        for r in dsir_weights(crawled, F.col("tgt"), n_buckets=64).collect()
    }
    assert inc_scores == full_scores


def test_dsir_score_unseen_buckets_use_smoothed_lam(spark):
    """Scoring a NEW doc against prior stats: bigrams in never-observed
    buckets must count in n_grams and carry the add-1-smoothed unseen
    weight (an inner join would drop them — review finding)."""
    from gnarly_spark.functions.text import (
        dsir_bucket_stats,
        dsir_lam,
        dsir_score,
        dsir_unseen_lam,
    )

    m = 4096  # wide bucket space so the novel bigrams miss the stats
    corpus = spark.createDataFrame(
        [(1, "the cell divides and the protein folds", True)],
        "doc_id long, text string, tgt boolean",
    )
    stats = dsir_bucket_stats(corpus, F.col("tgt"), m)
    lam = dsir_lam(stats, m)
    # dsir_unseen_lam == the python formula for cnt_t = cnt_r = 0
    r, t = 6, 6  # 7 tokens -> 6 bigrams, all target
    c = ((r + m) << 20) // (t + m)
    assert dsir_unseen_lam(stats, m) == max(c, 1).bit_length() - 1 - 20

    new = spark.createDataFrame(
        [(9, "zzyx qqwv pprt kkjh mmnb", None)],  # 4 novel bigrams
        "doc_id long, text string, tgt boolean",
    )
    # explicit unseen weight flows through (inner join would give (0, 0))
    scored = dsir_score(new, lam, m, unseen_lam=7).first()
    assert scored["n_grams"] == 4 and scored["dsir_logw"] == 4 * 7
    # default unseen_lam=0: grams still COUNT, weight contribution 0
    z = dsir_score(new, lam, m).first()
    assert z["n_grams"] == 4 and z["dsir_logw"] == 0


def test_pq_fixed_build_matches_python_reference(spark):
    """The per-subspace fixed-point PQ build must be ENGINE-EXACT: an
    independent pure-Python replay (same quantize / shared Knuth-init
    seeds / integer sub-distances / floor-division means) reproduces
    Spark's final code assignment bit-for-bit — the property the DuckDB
    oracle relies on."""
    import math

    from gnarly_spark.operators.similarity import (
        FIXED_POINT_SCALE,
        pq_build_fixed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {
        r.vec_id: [math.floor(float(x) * FIXED_POINT_SCALE + 0.5) for x in r.embedding]
        for r in rows
    }
    m, n_codes, iters = 4, 8, 2
    dim = len(next(iter(vecs.values())))
    ds = dim // m
    order = sorted(
        vecs, key=lambda i: (((i % 1000003) * 2654435761 + 1013904223) % 4294967296, i)
    )
    # per sub s (0-based): codebook code -> ds-wide slice of the seed
    cents = {
        s: {c: vecs[i][s * ds : (s + 1) * ds] for c, i in enumerate(order[:n_codes])}
        for s in range(m)
    }

    def nearest(s, q):
        return min(
            cents[s],
            key=lambda c: (sum((a - b) ** 2 for a, b in zip(q, cents[s][c])), c),
        )

    for _ in range(iters):
        assign = {
            (i, s): nearest(s, q[s * ds : (s + 1) * ds])
            for i, q in vecs.items()
            for s in range(m)
        }
        for s in range(m):
            for c in cents[s]:
                members = [
                    vecs[i][s * ds : (s + 1) * ds]
                    for (i, si), ci in assign.items()
                    if si == s and ci == c
                ]
                if members:
                    cents[s][c] = [
                        math.floor(sum(col) / len(members)) for col in zip(*members)
                    ]
    expected = {
        i: [nearest(s, q[s * ds : (s + 1) * ds]) for s in range(m)]
        for i, q in vecs.items()
    }

    _, codes_df, got_ds = pq_build_fixed(
        emb, m_subspaces=m, n_codes=n_codes, iterations=iters
    )
    assert got_ds == ds
    got = {r.id: list(r.codes) for r in codes_df.collect()}
    assert got == expected


def test_pq_ann_recall_and_shape(spark):
    """The refined (ADC shortlist + exact re-rank) path keeps useful
    recall vs exact cosine brute force on the unit-norm corpus (min-L2 ==
    max-cos); ranks are well-formed on both paths and the query itself
    never appears among its neighbors."""
    from gnarly_spark.operators.similarity import (
        cosine_topk,
        pq_ann_topk_fixed,
        pq_ann_topk_refined,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=3).collect()
    refined = pq_ann_topk_refined(
        emb, qids, k=3, shortlist=50, m_subspaces=8, n_codes=16
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    refined_set = {(r.query_id, r.neighbor_id) for r in refined}
    assert len(exact_set & refined_set) / len(exact_set) >= 0.5
    assert all(1 <= r.rank <= 3 for r in refined)
    assert all(r.query_id != r.neighbor_id for r in refined)
    adc = pq_ann_topk_fixed(emb, qids, k=3, m_subspaces=8, n_codes=16).collect()
    assert all(1 <= r.rank <= 3 for r in adc)
    assert all(r.query_id != r.neighbor_id for r in adc)
    # ADC distances are exact integers and strictly ordered within a query
    by_q = {}
    for r in adc:
        by_q.setdefault(r.query_id, []).append((r.rank, r.adist))
    for rows in by_q.values():
        rows.sort()
        assert all(a[1] <= b[1] for a, b in zip(rows, rows[1:]))
