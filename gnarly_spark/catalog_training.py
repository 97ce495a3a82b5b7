"""Training-data pipeline queries (dedup / similarity / text analysis)
registered into the driver catalog with DuckDB oracles.

Shared SQL fragments mirror the Spark operators in operators/dedup.py,
operators/similarity.py and functions/text.py exactly (same normalization,
same md5-derived hashes, same rounding) so results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gnarly_spark.catalog import _t, register
from gnarly_spark.operators.similarity import FIXED_POINT_SCALE as _FP_SCALE

# normalized text (lower + collapse whitespace) — DuckDB needs the 'g' flag
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

# distinct word 3-gram shingles per doc (list comprehension — DuckDB's
# generate_series can't take lateral column args)
_SHINGLES_SQL = f"""
    docs_n AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT id,
                  unnest([w[g] || ' ' || w[g+1] || ' ' || w[g+2]
                          for g in range(1, greatest(len(w) - 1, 1))]) AS shingle
           FROM docs_n)
"""

_JACCARD_SQL = f"""
    {_SHINGLES_SQL},
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
               GROUP BY a.id, b.id),
    jac AS (SELECT id_a, id_b,
                   ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b)
"""


@register(
    "dedup_exact",
    f"""
    SELECT md5({_NORM}) AS fingerprint, MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents WHERE {_NORM} IS NOT NULL GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    from gnarly_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"WITH {_JACCARD_SQL} SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5",
)
def dedup_ngram_jaccard(spark, sf_dir):
    from gnarly_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_minhash_signatures",
    f"""
    WITH {_SHINGLES_SQL}
    SELECT id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
    FROM sh, generate_series(0, 7) AS t(i) GROUP BY id, i
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    """Flattened (id, i, mh) minhash rows — row shape chosen over arrays so
    the oracle hash is representation-independent. Computed by the real
    operator (ONE groupBy carrying k min columns) and posexploded AFTER
    aggregation: k rows per doc on the way out, never k x |shingles| rows
    through the shuffle (the explode-before-groupBy shape _minhash_agg's
    docstring warns about)."""
    from gnarly_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(_t(spark, sf_dir, "documents"), k=8)
    return sig.select("id", F.posexplode("minhash").alias("i", "mh"))


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_JACCARD_SQL},
    mins AS (SELECT id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
             FROM sh, generate_series(0, 7) AS t(i) GROUP BY id, i),
    banded AS (SELECT id, i // 2 AS band,
                      md5(string_agg(mh, '|' ORDER BY i)) AS band_key
               FROM mins GROUP BY id, i // 2),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id)
    SELECT c.id_a, c.id_b, j.jaccard FROM cand c
    JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
    WHERE j.jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    from gnarly_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), k=8, bands=4, threshold=0.5)


@register(
    "dedup_incremental_lsh",
    f"""
    WITH {_SHINGLES_SQL},
    mins AS (SELECT id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS mh
             FROM sh, generate_series(0, 7) AS t(i) GROUP BY id, i),
    banded AS (SELECT id, i // 2 AS band,
                      md5(string_agg(mh, '|' ORDER BY i)) AS band_key
               FROM mins GROUP BY id, i // 2),
    cand AS (SELECT DISTINCT n.id AS new_id, c.id AS dup_of
             FROM banded n JOIN banded c
               ON n.band = c.band AND n.band_key = c.band_key
              AND n.id % 10 >= 8 AND c.id % 10 < 8),
    agree AS (SELECT cand.new_id, cand.dup_of,
                     ROUND(CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
                                AS DOUBLE) / 8, 6) AS est_jaccard
              FROM cand JOIN mins a ON a.id = cand.new_id
                        JOIN mins b ON b.id = cand.dup_of AND b.i = a.i
              GROUP BY cand.new_id, cand.dup_of)
    SELECT new_id, dup_of, est_jaccard FROM agree WHERE est_jaccard >= 0.5
    """,
)
def dedup_incremental_lsh(spark, sf_dir):
    """Incremental (per-batch) near-dup: the 20% of docs with
    doc_id % 10 >= 8 play the incoming micro-batch, checked against the
    persisted minhash signatures of the other 80% (the corpus). The batch
    side broadcasts; the corpus is scanned, never shuffled — the shape a
    CDC ingest uses to dedup arriving pages against 100 TB of history."""
    from gnarly_spark.operators.dedup import incremental_lsh_dups, minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    corpus_sigs = minhash_signatures(docs.where(F.col("doc_id") % 10 < 8))
    return incremental_lsh_dups(docs.where(F.col("doc_id") % 10 >= 8), corpus_sigs)


_SIMHASH_SQL = f"""
    toks AS (SELECT DISTINCT doc_id AS id, unnest(string_split({_NORM}, ' ')) AS tok
             FROM documents),
    th AS (SELECT id, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS th
           FROM toks WHERE tok != ''),
    bitsum AS (SELECT id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM th, generate_series(0, 31) AS t(b) GROUP BY id, b),
    simhashes AS (SELECT id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                                      ELSE 0 END) AS BIGINT) AS simhash
                  FROM bitsum GROUP BY id)
"""


@register(
    "dedup_simhash",
    f"WITH {_SIMHASH_SQL} SELECT id, simhash FROM simhashes",
)
def dedup_simhash(spark, sf_dir):
    from gnarly_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), bits=32)


# 64-bit simhash (the production precision: radius-3 at 32 bits matches a
# double-digit % of a templated web corpus — 1.57M pairs at sf0.1 — while
# 64 bits keeps only true near-dups). DuckDB reproduction notes: left shift
# overflow-checks, so the high md5 word composes via two's-complement
# multiplication and bit 63 is the MIN_LONG literal; right shift is
# arithmetic, but (th >> b) & 1 extracts bit b under either shift flavor.
_SIMHASH64_SQL = f"""
    toks AS (SELECT DISTINCT doc_id AS id, unnest(string_split({_NORM}, ' ')) AS tok
             FROM documents),
    th AS (SELECT id,
                  CASE WHEN hi >= 2147483648
                       THEN (hi - 4294967296) * 4294967296 + lo
                       ELSE hi * 4294967296 + lo END AS th
           FROM (SELECT id,
                        CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS hi,
                        CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT) AS lo
                 FROM toks WHERE tok != '') words),
    bitsum AS (SELECT id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM th, generate_series(0, 63) AS t(b) GROUP BY id, b),
    simhashes AS (SELECT id,
                         CAST(SUM(CASE WHEN s <= 0 THEN 0
                                       WHEN b = 63 THEN -9223372036854775807 - 1
                                       ELSE (CAST(1 AS BIGINT) << b) END) AS BIGINT)
                             AS simhash
                  FROM bitsum GROUP BY id)
"""


@register(
    "dedup_simhash_pairs",
    # exact all-pairs oracle: banded blocking with bands=4 > max_hamming=3
    # is pigeonhole-complete, so Spark's equi-join answer must equal this
    f"""
    WITH {_SIMHASH64_SQL}
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM simhashes a JOIN simhashes b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pair search by bit-band blocking (one equi-join on
    (band, band_val); no all-pairs). The oracle IS the all-pairs scan —
    equality proves the blocking recalls every pair within the radius.
    64-bit signatures: radius 3 of 64 is a near-dup, radius 3 of 32 was
    matching ~12% of ALL pairs on the templated corpus (output explosion)."""
    from gnarly_spark.operators.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, bands=4, bits=64
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_SQL},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
    SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark, sf_dir):
    """Connected components over n-gram-Jaccard near-dup pairs: each doc in
    a dup group labeled with the group's min id (keep id == cluster_id).
    Spark side: iterative hash-min label propagation; oracle: recursive
    transitive closure (exact same components)."""
    from gnarly_spark.operators.dedup import duplicate_clusters, jaccard_pairs

    pairs = jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)
    return duplicate_clusters(pairs)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_QUERY_IDS = [0, 1, 2, 3, 4]


@register(
    "sim_bruteforce_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id IN (0, 1, 2, 3, 4)),
    scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                      ROUND(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cos
               FROM embeddings e, q WHERE e.vec_id != q.query_id),
    ranked AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
    """,
)
def sim_bruteforce_topk(spark, sf_dir):
    from gnarly_spark.operators.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3)


@register(
    "sim_neardup_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 200 AND b.vec_id < 200
      AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
    """,
)
def sim_neardup_cosine(spark, sf_dir):
    from gnarly_spark.operators.similarity import neardup_pairs

    return neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35, max_id=200)


def _lsh_neardup_sql(n_planes: int, bands: int, threshold: float, dim: int = 64) -> str:
    """Oracle for neardup_pairs_lsh: the deterministic hyperplanes are
    generated ONCE here (same _hyperplanes seed as the operator) and
    embedded as DOUBLE[] literals, so DuckDB replays the identical banded
    semantics — sign bits, band keys, candidate join, exact cosine verify."""
    from gnarly_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    r = n_planes // bands
    def lit(p):
        return "[" + ", ".join(repr(x) for x in p) + "]"
    band_exprs = [
        " + ".join(
            f"(CASE WHEN list_dot_product(v, {lit(planes[b * r + j])}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(r)
        )
        for b in range(bands)
    ]
    bands_list = ", ".join(f"CAST({e} AS BIGINT)" for e in band_exprs)
    band_idx = ", ".join(str(b) for b in range(bands))
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    sk AS (SELECT id, unnest([{band_idx}]) AS band,
                  unnest([{bands_list}]) AS band_key
           FROM e),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM sk a JOIN sk b USING (band, band_key) WHERE a.id < b.id)
    SELECT id_a, id_b, ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cos
    FROM cand JOIN e ea ON ea.id = cand.id_a JOIN e eb ON eb.id = cand.id_b
    WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= {threshold}
    """


@register("sim_neardup_lsh", _lsh_neardup_sql(n_planes=16, bands=4, threshold=0.35))
def sim_neardup_lsh(spark, sf_dir):
    """Scale path for sim_neardup_cosine: banded sign-LSH candidates (one
    shuffle on (band, band_key), never all-pairs) + exact cosine verify on
    candidates only. operators/similarity.neardup_pairs_lsh; the oracle
    replays the same hyperplanes as literals, so precision AND the banded
    recall semantics are hash-checked, not just row counts."""
    from gnarly_spark.operators.similarity import neardup_pairs_lsh

    return neardup_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=16, bands=4
    )


# LSH-bucketed ANN. n_planes=6 / probe_radius=2 is the measured
# >=0.8-recall config on the driver embeddings (sim_lsh_recall makes the
# number driver-visible). Round 3 upgraded both from rows-only to full
# value-hash oracles: the deterministic hyperplanes embed as literals
# (same trick as sim_neardup_lsh) and multi-probe is bit_count(xor) <=
# radius in DuckDB — bucket bits, probe set, cosine, tie-break and the
# recall arithmetic are all hash-checked now.
_LSH_CFG = {"n_planes": 6, "probe_radius": 2}


def _lsh_bucket_sql(n_planes: int, dim: int = 64) -> str:
    """DuckDB expression for lsh_sketch's bucket over literal planes."""
    from gnarly_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"CAST({terms} AS BIGINT)"


def _lsh_cand_sql(n_planes: int, radius: int) -> str:
    """Shared CTE block: sketches, query probes, candidate pairs."""
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
    e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    sk AS (SELECT id, v, {_lsh_bucket_sql(n_planes)} AS bucket FROM e),
    q AS (SELECT id AS query_id, v AS qv, bucket AS qb FROM sk
          WHERE id IN ({ids})),
    scored AS (SELECT q.query_id, s.id AS neighbor_id,
                      ROUND(list_cosine_similarity(q.qv, s.v), 6) AS cos
               FROM sk s JOIN q ON s.id <> q.query_id
                AND bit_count(xor(s.bucket, q.qb)) <= {radius}),
    ranked AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM scored)
    """


@register(
    "sim_lsh_ann",
    f"WITH {_lsh_cand_sql(6, 2)} "
    "SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3",
)
def sim_lsh_ann(spark, sf_dir):
    from gnarly_spark.operators.similarity import lsh_ann_topk

    return lsh_ann_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3, **_LSH_CFG)


# IVF ANN. Round-3 upgrade: the fixed-point k-means build
# (operators/similarity.ivf_build_fixed — integer quantize, Knuth-hash init,
# exact integer distances, floor-division means) is engine-exact, so DuckDB
# replays the full Lloyd iteration chain in CTEs (the graph_pagerank trick)
# and the IVF path gets a value-hash oracle instead of rows-only.
_IVF_CFG = {"n_centroids": 16, "n_probe": 8, "iterations": 3}


def _ivf_dist_sql(q: str, c: str, dim: int) -> str:
    return (
        f"list_sum([ ({q}[g]-{c}[g])*({q}[g]-{c}[g])"
        f" for g in range(1, {dim + 1}) ])"
    )


def _ivf_assign_sql(
    n_centroids: int, iterations: int, dim: int = 64, source: str = "embeddings"
) -> str:
    """CTE chain replaying ivf_build_fixed over ``source``: every step
    exact integer arithmetic, so any engine reproduces the identical
    clustering. Ends with `af(id, cluster)` (plus `e(id, v, qi)`)."""
    from gnarly_spark.operators.similarity import FIXED_POINT_SCALE

    def dist(q, c):
        return _ivf_dist_sql(q, c, dim)

    parts = [
        f"""
    e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                 [CAST(FLOOR(x * {FIXED_POINT_SCALE} + 0.5) AS BIGINT)
                  for x in embedding::DOUBLE[]] AS qi
          FROM {source}),
    c0 AS (SELECT CAST(row_number() OVER (ORDER BY rk, id) - 1 AS INT) AS cluster,
                  qi AS c
           FROM (SELECT id, qi,
                        ((id % 1000003) * 2654435761 + 1013904223) % 4294967296 AS rk
                 FROM e ORDER BY rk, id LIMIT {n_centroids}))"""
    ]
    prev = "c0"
    for it in range(1, iterations + 1):
        parts.append(
            f"""
    a{it} AS (SELECT id, qi, cluster FROM (
            SELECT id, qi, cluster,
                   row_number() OVER (PARTITION BY id ORDER BY d, cluster) AS rn
            FROM (SELECT e.id, e.qi, c.cluster, {dist('e.qi', 'c.c')} AS d
                  FROM e CROSS JOIN {prev} c)) WHERE rn = 1),
    m{it} AS (SELECT cluster, pos,
                     CAST(FLOOR(SUM(qi[pos]) * 1.0 / COUNT(*)) AS BIGINT) AS m
              FROM a{it}, range(1, {dim + 1}) t(pos) GROUP BY cluster, pos),
    c{it} AS (SELECT p.cluster, coalesce(n.c, p.c) AS c
              FROM {prev} p LEFT JOIN
                   (SELECT cluster, list(m ORDER BY pos) AS c
                    FROM m{it} GROUP BY cluster) n USING (cluster))"""
        )
        prev = f"c{it}"
    parts.append(
        f"""
    af AS (SELECT id, cluster FROM (
            SELECT id, cluster,
                   row_number() OVER (PARTITION BY id ORDER BY d, cluster) AS rn
            FROM (SELECT e.id, c.cluster, {dist('e.qi', 'c.c')} AS d
                  FROM e CROSS JOIN {prev} c)) WHERE rn = 1)"""
    )
    return ",".join(parts)


def _ivf_cand_sql(
    n_centroids: int, n_probe: int, iterations: int, dim: int = 64
) -> str:
    """_ivf_assign_sql + probe + candidate scoring. The final cosine is
    double (rounded 6 dp — the same sequential-sum form both engines
    compute), so the whole ANN result value-hashes. Ends with
    `ranked(query_id, neighbor_id, cos, rank)`."""
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    dist = _ivf_dist_sql
    return (
        _ivf_assign_sql(n_centroids, iterations, dim)
        + f""",
    qs AS (SELECT id AS query_id, v AS qv, qi AS qq FROM e WHERE id IN ({ids})),
    pr AS (SELECT query_id, cluster FROM (
            SELECT query_id, cluster,
                   row_number() OVER (PARTITION BY query_id ORDER BY d, cluster) AS rn
            FROM (SELECT q.query_id, c.cluster, {dist('q.qq', 'c.c', dim)} AS d
                  FROM qs q CROSS JOIN c{iterations} c)) WHERE rn <= {n_probe}),
    scored AS (SELECT pr.query_id, a.id AS neighbor_id,
                      ROUND(list_cosine_similarity(q.qv, e2.v), 6) AS cos
               FROM pr JOIN af a USING (cluster)
                       JOIN qs q ON q.query_id = pr.query_id
                       JOIN e e2 ON e2.id = a.id
               WHERE a.id <> pr.query_id),
    ranked AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
               FROM scored)"""
    )


@register(
    "sim_ivf_ann",
    f"WITH {_ivf_cand_sql(16, 8, 3)} "
    "SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3",
)
def sim_ivf_ann(spark, sf_dir):
    from gnarly_spark.operators.similarity import ivf_ann_topk_fixed

    return ivf_ann_topk_fixed(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3, **_IVF_CFG
    )


def _recall_vs_bruteforce(spark, sf_dir, ann) -> "DataFrame":
    """(query_id, recall_at_k) of an ANN result against the exact
    brute-force top-k, computed in-Spark (left-semi hit join + count)."""
    from gnarly_spark.operators.similarity import cosine_topk

    bf = cosine_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3)
    hits = ann.select("query_id", "neighbor_id").join(
        bf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    qs = spark.createDataFrame([(q,) for q in _QUERY_IDS], "query_id long")
    return (
        qs.join(hits.groupBy("query_id").agg(F.count("*").alias("_n")), "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce(F.col("_n"), F.lit(0)) / 3.0, 6).alias("recall_at_k"),
        )
    )


# ANN quality made driver-visible: per-query recall@k of each approximate
# path vs the exact brute force. Both are value-hash-checked: LSH via the
# literal-planes oracle, IVF via the fixed-point Lloyd replay (so the
# driver sees recall AND verifies the arithmetic that produced it).
@register(
    "sim_lsh_recall",
    f"""
    WITH {_lsh_cand_sql(6, 2)},
    ann AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 3),
    bf_scored AS (SELECT q.query_id, s.id AS neighbor_id,
                         ROUND(list_cosine_similarity(q.qv, s.v), 6) AS cos
                  FROM e s JOIN q ON s.id <> q.query_id),
    bf AS (SELECT query_id, neighbor_id FROM
             (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS r FROM bf_scored)
           WHERE r <= 3),
    hits AS (SELECT ann.query_id, COUNT(*) AS n
             FROM ann JOIN bf USING (query_id, neighbor_id) GROUP BY 1)
    SELECT query_id, ROUND(coalesce(n, 0) / 3.0, 6) AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM q) qq LEFT JOIN hits USING (query_id)
    """,
)
def sim_lsh_recall(spark, sf_dir):
    from gnarly_spark.operators.similarity import lsh_ann_topk

    ann = lsh_ann_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3, **_LSH_CFG)
    return _recall_vs_bruteforce(spark, sf_dir, ann)


_SEMDEDUP_PAIRS_SQL = f"""
    {_ivf_assign_sql(16, 3)},
    pairs AS (SELECT a.id AS id_a, b.id AS id_b,
                     ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cos
              FROM af a JOIN af b ON a.cluster = b.cluster AND a.id < b.id
                   JOIN e ea ON ea.id = a.id JOIN e eb ON eb.id = b.id
              WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.35)"""


@register(
    "sim_semdedup_pairs",
    f"WITH {_SEMDEDUP_PAIRS_SQL} SELECT id_a, id_b, cos FROM pairs",
)
def sim_semdedup_pairs(spark, sf_dir):
    from gnarly_spark.operators.similarity import semantic_dedup_pairs

    return semantic_dedup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_centroids=16, iterations=3
    )


@register(
    "sim_semdedup_keep",
    f"""
    WITH RECURSIVE {_SEMDEDUP_PAIRS_SQL},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.id),
    clusters AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT v.vec_id, COALESCE(c.cluster_id, v.vec_id) AS cluster_id,
           (COALESCE(c.cluster_id, v.vec_id) = v.vec_id) AS keep
    FROM embeddings v LEFT JOIN clusters c ON c.id = v.vec_id
    """,
)
def sim_semdedup_keep(spark, sf_dir):
    """The SemDeDup decision a pipeline consumes: every vector labeled
    (cluster_id, keep) — within-cluster near-dup pairs -> connected
    components (hash-min label propagation) -> keep the component's min
    id; vectors in no pair keep themselves. Same consumption shape as
    dedup_keep_list, but over semantic (embedding) duplicates."""
    from gnarly_spark.operators.dedup import duplicate_clusters
    from gnarly_spark.operators.similarity import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = semantic_dedup_pairs(emb, threshold=0.35, n_centroids=16, iterations=3)
    clusters = duplicate_clusters(pairs.select("id_a", "id_b"))
    return (
        emb.select("vec_id")
        .join(
            clusters.withColumnRenamed("id", "vec_id").hint("shuffle_hash"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id")).alias("keep"),
        )
    )


@register(
    "sim_semdedup_incremental",
    f"""
    WITH {_ivf_assign_sql(16, 3, source="(SELECT * FROM embeddings WHERE vec_id % 10 < 8)")},
    nb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  [CAST(FLOOR(x * {_FP_SCALE} + 0.5) AS BIGINT)
                   for x in embedding::DOUBLE[]] AS qi
           FROM embeddings WHERE vec_id % 10 >= 8),
    nba AS (SELECT id, v, cluster FROM (
             SELECT id, v, cluster,
                    row_number() OVER (PARTITION BY id ORDER BY d, cluster) AS rn
             FROM (SELECT nb.id, nb.v, c.cluster, {_ivf_dist_sql('nb.qi', 'c.c', 64)} AS d
                   FROM nb CROSS JOIN c3 c)) WHERE rn = 1)
    SELECT nba.id AS new_id, a.id AS dup_of,
           ROUND(list_cosine_similarity(nba.v, e2.v), 6) AS cos
    FROM nba JOIN af a USING (cluster) JOIN e e2 ON e2.id = a.id
    WHERE ROUND(list_cosine_similarity(nba.v, e2.v), 6) >= 0.35
      AND a.id != nba.id
    """,
)
def sim_semdedup_incremental(spark, sf_dir):
    """Incremental semantic dedup: the 20% of vectors with vec_id % 10 >= 8
    play the incoming micro-batch, flagged against the clustered 80%
    corpus (same split as dedup_incremental_lsh). Corpus scanned, never
    shuffled on the candidate join; batch broadcasts."""
    from gnarly_spark.operators.similarity import semantic_dedup_incremental

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_incremental(
        emb.where(F.col("vec_id") % 10 >= 8),
        emb.where(F.col("vec_id") % 10 < 8),
        threshold=0.35,
        n_centroids=16,
        iterations=3,
    )


@register(
    "sim_ivf_recall",
    f"""
    WITH {_ivf_cand_sql(16, 8, 3)},
    ann AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 3),
    bf_scored AS (SELECT q.query_id, s.id AS neighbor_id,
                         ROUND(list_cosine_similarity(q.qv, s.v), 6) AS cos
                  FROM e s JOIN qs q ON s.id <> q.query_id),
    bf AS (SELECT query_id, neighbor_id FROM
             (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS r FROM bf_scored)
           WHERE r <= 3),
    hits AS (SELECT ann.query_id, COUNT(*) AS n
             FROM ann JOIN bf USING (query_id, neighbor_id) GROUP BY 1)
    SELECT query_id, ROUND(coalesce(n, 0) / 3.0, 6) AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM qs) qq LEFT JOIN hits USING (query_id)
    """,
)
def sim_ivf_recall(spark, sf_dir):
    from gnarly_spark.operators.similarity import ivf_ann_topk_fixed

    ann = ivf_ann_topk_fixed(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3, **_IVF_CFG
    )
    return _recall_vs_bruteforce(spark, sf_dir, ann)


# Product quantization (operators/similarity.pq_build_fixed — Jégou et al.
# 2011). Same engine-exact integer arithmetic as the IVF build, per
# subspace, so DuckDB replays the sub-codebook training AND the ADC scan;
# the approximate distance is a BIGINT, so the whole result value-hashes
# with no float anywhere.
_PQ_CFG = {"m_subspaces": 8, "n_codes": 16, "iterations": 2}
_PQ_SHORTLIST = 50


def _pq_sql(m: int, n_codes: int, iterations: int, dim: int = 64) -> str:
    """CTE chain replaying pq_build_fixed + the ADC scan. Ends with
    `ranked(query_id, neighbor_id, adist, rank)` (plus `e`, `qs`)."""
    from gnarly_spark.operators.similarity import FIXED_POINT_SCALE

    ds = dim // m
    ids = ", ".join(str(i) for i in _QUERY_IDS)

    def dist(q, c):
        return _ivf_dist_sql(q, c, ds)

    parts = [
        f"""
    e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                 [CAST(FLOOR(x * {FIXED_POINT_SCALE} + 0.5) AS BIGINT)
                  for x in embedding::DOUBLE[]] AS qi
          FROM embeddings),
    sub AS (SELECT id, CAST(s AS INT) AS s,
                   qi[(s-1)*{ds}+1 : s*{ds}] AS sv
            FROM e, range(1, {m + 1}) t(s)),
    seeds AS (SELECT CAST(row_number() OVER (ORDER BY rk, id) - 1 AS INT)
                       AS code, qi
              FROM (SELECT id, qi,
                           ((id % 1000003) * 2654435761 + 1013904223)
                             % 4294967296 AS rk
                    FROM e ORDER BY rk, id LIMIT {n_codes})),
    c0 AS (SELECT CAST(s AS INT) AS s, code,
                  qi[(s-1)*{ds}+1 : s*{ds}] AS cv
           FROM seeds, range(1, {m + 1}) t(s))"""
    ]
    prev = "c0"
    for it in range(1, iterations + 1):
        parts.append(
            f"""
    a{it} AS (SELECT id, s, sv, code FROM (
            SELECT id, s, sv, code,
                   row_number() OVER (PARTITION BY id, s ORDER BY d, code) AS rn
            FROM (SELECT sub.id, sub.s, sub.sv, c.code,
                         {dist('sub.sv', 'c.cv')} AS d
                  FROM sub JOIN {prev} c ON c.s = sub.s)) WHERE rn = 1),
    m{it} AS (SELECT s, code, pos,
                     CAST(FLOOR(SUM(sv[pos]) * 1.0 / COUNT(*)) AS BIGINT) AS m
              FROM a{it}, range(1, {ds + 1}) t(pos) GROUP BY s, code, pos),
    c{it} AS (SELECT p.s, p.code, coalesce(n.cv, p.cv) AS cv
              FROM {prev} p LEFT JOIN
                   (SELECT s, code, list(m ORDER BY pos) AS cv
                    FROM m{it} GROUP BY s, code) n USING (s, code))"""
        )
        prev = f"c{it}"
    parts.append(
        f"""
    af AS (SELECT id, s, code FROM (
            SELECT id, s, code,
                   row_number() OVER (PARTITION BY id, s ORDER BY d, code) AS rn
            FROM (SELECT sub.id, sub.s, c.code, {dist('sub.sv', 'c.cv')} AS d
                  FROM sub JOIN {prev} c ON c.s = sub.s)) WHERE rn = 1),
    qs AS (SELECT id AS query_id, s, sv FROM sub WHERE id IN ({ids})),
    lut AS (SELECT q.query_id, q.s, c.code, {dist('q.sv', 'c.cv')} AS d
            FROM qs q JOIN {prev} c ON c.s = q.s),
    adist AS (SELECT l.query_id, a.id AS neighbor_id,
                     CAST(SUM(l.d) AS BIGINT) AS adist
              FROM af a JOIN lut l ON l.s = a.s AND l.code = a.code
              WHERE a.id <> l.query_id
              GROUP BY 1, 2),
    ranked AS (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
               FROM adist)"""
    )
    return ",".join(parts)


@register(
    "sim_pq_ann",
    f"WITH {_pq_sql(8, 16, 2)} "
    "SELECT query_id, neighbor_id, adist, rank FROM ranked WHERE rank <= 3",
)
def sim_pq_ann(spark, sf_dir):
    """PQ/ADC top-k (operators/similarity.pq_ann_topk_fixed): m=8 one-byte
    codes per 64-dim vector (8x compression over float32 — the
    memory-bound ANN path for a 1e10-vector corpus), per-query broadcast
    LUTs, map-only integer-exact distance sum over the codes relation."""
    from gnarly_spark.operators.similarity import pq_ann_topk_fixed

    return pq_ann_topk_fixed(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3, **_PQ_CFG
    )


@register(
    "sim_pq_refined",
    f"""
    WITH {_pq_sql(8, 16, 2)},
    short AS (SELECT query_id, neighbor_id FROM ranked
              WHERE rank <= {_PQ_SHORTLIST}),
    rer AS (SELECT s.query_id, s.neighbor_id,
                   ROUND(list_cosine_similarity(q.v, e2.v), 6) AS cos
            FROM short s JOIN e q ON q.id = s.query_id
                         JOIN e e2 ON e2.id = s.neighbor_id),
    rranked AS (SELECT *, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
                    AS rank
                FROM rer)
    SELECT query_id, neighbor_id, cos, rank FROM rranked WHERE rank <= 3
    """,
)
def sim_pq_refined(spark, sf_dir):
    """Two-stage PQ serving (operators/similarity.pq_ann_topk_refined):
    integer ADC shortlist from the compressed codes, exact cosine re-rank
    on only the fetched shortlist vectors — the retrieve-then-refine
    pattern production PQ deployments run."""
    from gnarly_spark.operators.similarity import pq_ann_topk_refined

    return pq_ann_topk_refined(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3,
        shortlist=_PQ_SHORTLIST, **_PQ_CFG,
    )


@register(
    "sim_pq_recall",
    f"""
    WITH {_pq_sql(8, 16, 2)},
    short AS (SELECT query_id, neighbor_id FROM ranked
              WHERE rank <= {_PQ_SHORTLIST}),
    rer AS (SELECT s.query_id, s.neighbor_id,
                   ROUND(list_cosine_similarity(q.v, e2.v), 6) AS cos
            FROM short s JOIN e q ON q.id = s.query_id
                         JOIN e e2 ON e2.id = s.neighbor_id),
    ann AS (SELECT query_id, neighbor_id FROM
              (SELECT *, row_number() OVER
                 (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r
               FROM rer)
            WHERE r <= 3),
    bf_scored AS (SELECT q.query_id, s.id AS neighbor_id,
                         ROUND(list_cosine_similarity(q.qv, s.v), 6) AS cos
                  FROM e s JOIN (SELECT id AS query_id, v AS qv FROM e
                                 WHERE id IN ({", ".join(str(i) for i in _QUERY_IDS)}))
                           q ON s.id <> q.query_id),
    bf AS (SELECT query_id, neighbor_id FROM
             (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS r FROM bf_scored)
           WHERE r <= 3),
    hits AS (SELECT ann.query_id, COUNT(*) AS n
             FROM ann JOIN bf USING (query_id, neighbor_id) GROUP BY 1)
    SELECT query_id, ROUND(coalesce(n, 0) / 3.0, 6) AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM qs) qq LEFT JOIN hits USING (query_id)
    """,
)
def sim_pq_recall(spark, sf_dir):
    """Driver-visible PQ quality: recall@3 of the refined (shortlist +
    exact re-rank) path against the exact cosine brute force (unit-norm
    corpus, so min-L2 == max-cosine and the comparison is
    apples-to-apples)."""
    from gnarly_spark.operators.similarity import pq_ann_topk_refined

    ann = pq_ann_topk_refined(
        _t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=3,
        shortlist=_PQ_SHORTLIST, **_PQ_CFG,
    )
    return _recall_vs_bruteforce(spark, sf_dir, ann)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _count_word_sql(word: str) -> str:
    return f"len(regexp_extract_all({_NORM}, '\\b{word}\\b'))"


def _lang_score_sql(words: list[str]) -> str:
    return " + ".join(_count_word_sql(w) for w in words)


def _langid_oracle() -> str:
    from gnarly_spark.functions.langid import oracle_sql_langid

    return oracle_sql_langid()


@register("text_lang_id", _langid_oracle())
def text_lang_id(spark, sf_dir):
    """Char-trigram NB language ID over the committed 24-language model
    (functions/langid.py) — upgraded from the 4-language stopword scorer
    (VERDICT r03 missing #3). The oracle replays the identical integer
    scoring over the identical parquet model in DuckDB."""
    from gnarly_spark.functions.langid import lang_id_ngram

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id_ngram(F.col("text")).alias("pred_lang"))


@register(
    "text_quality",
    f"""
    WITH base AS (
      SELECT doc_id, {_NORM} AS norm, text,
             {_lang_score_sql(["the", "a", "of", "and"])} AS stop,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(text) AS n_chars
      FROM documents),
    tok AS (SELECT *, CASE WHEN norm = '' THEN 0
                           ELSE len(string_split(norm, ' ')) END AS n_tokens
            FROM base)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
           ROUND(n_alpha / greatest(n_chars, 1), 6) AS alpha_ratio,
           ROUND(0.5 * stop / greatest(n_tokens, 1)
                 + 0.3 * n_alpha / greatest(n_chars, 1)
                 + 0.2 * least(n_tokens, 100) / 100, 6) AS quality_score
    FROM tok
    """,
)
def text_quality(spark, sf_dir):
    from gnarly_spark.functions.text import quality_features

    return quality_features(_t(spark, sf_dir, "documents"))


@register(
    "text_token_count",
    f"""
    SELECT doc_id,
           CAST(CASE WHEN {_NORM} = '' THEN 0
                     ELSE len(string_split({_NORM}, ' ')) END AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    from gnarly_spark.functions.text import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@register(
    "text_stratified_split",
    """
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT *, CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 AS bucket
          FROM documents)
    GROUP BY 1, 2
    """,
)
def text_stratified_split(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10) by md5(doc_id) —
    reproducible in any engine, no RNG state, stable under re-runs and
    appends (a doc's split never changes). The standard corpus-split
    pattern at 100 TB: a projection, not a shuffle."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return (
        d.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "text_shuffle_shard",
    """
    WITH a AS (SELECT doc_id,
                      CAST(('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                           AS BIGINT) AS sort_key
               FROM documents)
    SELECT CAST(sort_key % 16 AS INT) AS shard,
           COUNT(*) AS n_docs,
           MIN(sort_key) AS first_key, MAX(sort_key) AS last_key,
           CAST(CAST(SUM(sort_key) AS HUGEINT) AS VARCHAR) AS key_checksum
    FROM a GROUP BY 1
    """,
)
def text_shuffle_shard(spark, sf_dir):
    """Deterministic global shuffle + shard census (the layout step a
    training data loader consumes). functions/text.shard_assign; shard
    and order derive from md5(salt:doc_id), so the oracle replays the
    exact permutation — per-shard counts, boundary keys and the full
    key checksum are all hash-checked."""
    from gnarly_spark.functions.text import shard_assign

    return (
        shard_assign(_t(spark, sf_dir, "documents"), n_shards=16)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("sort_key").alias("first_key"),
            F.max("sort_key").alias("last_key"),
            F.sum(F.col("sort_key").cast("decimal(38,0)"))
            .cast("string")
            .alias("key_checksum"),
        )
    )


@register(
    "text_source_stats",
    """
    SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY source
    """,
)
def text_source_stats(spark, sf_dir):
    """Per-source (container-level) corpus statistics — the profiling pass
    a crawl-scale pipeline runs before filtering; one partial-agg groupBy."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@register(
    "text_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
)
def text_fingerprint(spark, sf_dir):
    from gnarly_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "text_collapse_repeats",
    f"""
    WITH d AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
    k AS (SELECT doc_id, w,
                 [w[g] for g in range(1, len(w) + 1)
                  if g = 1 OR w[g] != w[g-1]] AS kept
          FROM d)
    SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
           CAST(len(w) - len(kept) AS BIGINT) AS n_removed
    FROM k
    """,
)
def text_collapse_repeats(spark, sf_dir):
    """Within-doc repetition cleanup: collapse consecutive repeated tokens
    (map-only JVM array pass, no shuffle)."""
    from gnarly_spark.functions.text import collapse_repeat_tokens

    return collapse_repeat_tokens(_t(spark, sf_dir, "documents"))


@register(
    "text_top_bigrams",
    f"""
    WITH docs_n AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w
                    FROM documents),
    sh AS (SELECT DISTINCT id,
                  unnest([w[g] || ' ' || w[g+1] for g in range(1, len(w))])
                    AS bigram
           FROM docs_n)
    SELECT bigram, COUNT(*) AS doc_freq FROM sh
    GROUP BY bigram ORDER BY doc_freq DESC, bigram LIMIT 20
    """,
)
def text_top_bigrams(spark, sf_dir):
    """Corpus vocabulary building: top-20 word bigrams by DOCUMENT
    frequency (distinct per doc, so spam repetition inside one doc can't
    inflate a phrase). One partial-agg count over the distinct shingle
    relation + TakeOrdered top-k — the shape that holds at any corpus
    size."""
    from gnarly_spark.operators.dedup import shingles

    sh = shingles(_t(spark, sf_dir, "documents"), n=2)
    return (
        sh.groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "bigram")
        .limit(20)
    )


@register(
    "text_winnow_fingerprint",
    f"""
    WITH base AS (SELECT doc_id AS id, {_NORM} AS t FROM documents),
    grams AS (SELECT id,
                CASE WHEN length(t) >= 8 THEN
                  [CAST(('0x' || substring(md5(substring(t, g, 8)), 1, 8)) AS BIGINT)
                   for g in range(1, length(t) - 8 + 2)]
                ELSE [] END AS h
              FROM base),
    wins AS (SELECT id,
               CASE WHEN len(h) >= 4 THEN
                 [list_min(h[j:j+3]) for j in range(1, len(h) - 4 + 2)]
               ELSE [] END AS f
             FROM grams)
    SELECT DISTINCT id, unnest(f) AS fp FROM wins
    """,
)
def text_winnow_fingerprint(spark, sf_dir):
    """Winnowing (rolling k-gram hash + window-min) fingerprints — the
    local-edit-robust document fingerprint (k=8, w=4), distinct (id, fp)."""
    from gnarly_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, w=4)


@register(
    "text_url_canonicalize",
    r"""
    WITH raw AS (
      SELECT event_id,
             CASE CAST(event_id % 4 AS INTEGER)
               WHEN 0 THEN 'HTTPS://Site-' || CAST(user_id AS VARCHAR)
                           || '.Example:443/Page/' || CAST(event_id AS VARCHAR) || '?utm=x#top'
               WHEN 1 THEN 'http://site-' || CAST(user_id AS VARCHAR)
                           || '.example:80/page/' || CAST(event_id AS VARCHAR) || '/'
               WHEN 2 THEN 'https://SITE-' || CAST(user_id AS VARCHAR)
                           || '.example/page/' || CAST(event_id AS VARCHAR) || '#frag'
               ELSE 'http://site-' || CAST(user_id AS VARCHAR)
                           || '.example:8080/Page/' || CAST(event_id AS VARCHAR)
             END AS url
      FROM events WHERE event_id < 400),
    pre AS (SELECT event_id, url,
                   lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) AS pfx
            FROM raw),
    joined AS (SELECT event_id,
                      pfx || substring(url, length(pfx) + 1) AS u
               FROM pre),
    steps AS (SELECT event_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(u, '#.*$', ''),
              '\?.*$', ''),
            '^(http://[^/:]*):80(/|$)', '\1\2'),
          '^(https://[^/:]*):443(/|$)', '\1\2'),
        '(.)/$', '\1') AS canonical_url
      FROM joined)
    SELECT event_id, canonical_url FROM steps
    """,
)
def text_url_canonicalize(spark, sf_dir):
    """Crawl-URL canonicalization — the dedup-key normalizer applied before
    every url-keyed operation (our CDC merge key IS the url): lowercase
    scheme+host, strip fragment/query, drop default ports, strip trailing
    slash. Messy variants are synthesized deterministically from events so
    the oracle sees identical inputs."""
    from gnarly_spark.functions.url import canonicalize_url_dropquery as canonicalize_url

    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 400)
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id").cast("string")
    raw = (
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(F.lit("HTTPS://Site-"), uid, F.lit(".Example:443/Page/"), eid, F.lit("?utm=x#top")),
        )
        .when(
            F.col("event_id") % 4 == 1,
            F.concat(F.lit("http://site-"), uid, F.lit(".example:80/page/"), eid, F.lit("/")),
        )
        .when(
            F.col("event_id") % 4 == 2,
            F.concat(F.lit("https://SITE-"), uid, F.lit(".example/page/"), eid, F.lit("#frag")),
        )
        .otherwise(
            F.concat(F.lit("http://site-"), uid, F.lit(".example:8080/Page/"), eid),
        )
    )
    return e.select("event_id", canonicalize_url(raw).alias("canonical_url"))


@register(
    "text_pii_scrub",
    r"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example-mail.org or call 555-123-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                  || ' ref ' || CAST(doc_id AS VARCHAR) AS t
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g'),
             '\d(?:[ .-]?\d){6,}', '<NUMBER>', 'g') AS scrubbed
    FROM raw
    """,
)
def text_pii_scrub(spark, sf_dir):
    """Pre-training PII scrubbing: emails then long digit runs masked, one
    specified regexp chain (JVM-side, no Python) — planted PII appended to
    each doc deterministically so the pass provably fires on every row."""
    from gnarly_spark.functions.text import scrub_pii

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example-mail.org or call 555-123-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
        F.lit(" ref "), F.col("doc_id").cast("string"),
    )
    return d.select("doc_id", scrub_pii(planted).alias("scrubbed"))


@register(
    "dedup_keep_list",
    f"""
    WITH RECURSIVE {_JACCARD_SQL},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
    clusters AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           (COALESCE(c.cluster_id, d.doc_id) = d.doc_id) AS keep
    FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
    """,
)
def dedup_keep_list(spark, sf_dir):
    """The end-to-end dedup decision a corpus pipeline actually consumes:
    EVERY doc labeled (cluster_id, keep) — near-dup pairs (exact n-gram
    Jaccard >= 0.5) -> connected components -> keep the cluster's min id;
    docs in no dup pair keep themselves. Filtering the corpus is then one
    semi-join on keep=true."""
    from gnarly_spark.operators.dedup import duplicate_clusters, jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    clusters = duplicate_clusters(jaccard_pairs(docs, threshold=0.5))
    return (
        docs.select(F.col("doc_id"))
        # clusters is O(dup docs) — worst-case a constant fraction of the
        # corpus, and its checkpointed plan carries inherited (unreliable)
        # stats: never let the static planner broadcast it
        .join(
            clusters.withColumnRenamed("id", "doc_id").hint("shuffle_hash"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


@register(
    "dedup_winnow_containment",
    f"""
    WITH base AS (SELECT doc_id AS id, {_NORM} AS t FROM documents),
    grams AS (SELECT id,
                CASE WHEN length(t) >= 8 THEN
                  [CAST(('0x' || substring(md5(substring(t, g, 8)), 1, 8)) AS BIGINT)
                   for g in range(1, length(t) - 8 + 2)]
                ELSE [] END AS h
              FROM base),
    wins AS (SELECT id,
               CASE WHEN len(h) >= 4 THEN
                 [list_min(h[j:j+3]) for j in range(1, len(h) - 4 + 2)]
               ELSE [] END AS f
             FROM grams),
    fp AS (SELECT DISTINCT id, unnest(f) AS fp FROM wins),
    sizes AS (SELECT id, COUNT(*) AS n_fp FROM fp GROUP BY id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
               FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id
               GROUP BY a.id, b.id)
    SELECT id_a, id_b, n_common,
           ROUND(n_common / sa.n_fp, 6) AS containment_a,
           ROUND(n_common / sb.n_fp, 6) AS containment_b
    FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    WHERE n_common / sa.n_fp >= 0.5 OR n_common / sb.n_fp >= 0.5
    """,
)
def dedup_winnow_containment(spark, sf_dir):
    """Winnowing-fingerprint CONTAINMENT pairs (the MOSS overlap measure):
    containment_x = |fp(a) AND fp(b)| / |fp(x)| — catches a short doc
    embedded in a long one, which symmetric Jaccard under-scores. One
    equi-join on fingerprint + one agg; quadratic only on docs that
    actually share fingerprints."""
    from gnarly_spark.operators.dedup import winnow_fingerprints

    fp = winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, w=4)
    sizes = fp.groupBy("id").agg(F.count("*").alias("n_fp"))
    # every side is O(corpus x fingerprints): pin shuffle_hash so the
    # static planner never broadcast-builds one (see minhash_lsh_pairs)
    a, b = fp.alias("a").hint("shuffle_hash"), fp.alias("b")
    common = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # hint the PAIR side: hinted = per-partition build side, and a hinted
    # SHJ pre-empts any static broadcast of the corpus-sized sizes relation
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b"))
    return (
        common.hint("shuffle_hash")
        .join(sa, "id_a")
        .hint("shuffle_hash")
        .join(sb, "id_b")
        .where(
            (F.col("n_common") / F.col("n_a") >= 0.5)
            | (F.col("n_common") / F.col("n_b") >= 0.5)
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(F.col("n_common") / F.col("n_a"), 6).alias("containment_a"),
            F.round(F.col("n_common") / F.col("n_b"), 6).alias("containment_b"),
        )
    )


@register(
    "text_decontaminate",
    f"""
    WITH {_SHINGLES_SQL},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 97 = 0),
    hits AS (SELECT id, COUNT(*) AS n_hits
             FROM sh JOIN bench USING (shingle)
             WHERE id % 97 != 0 GROUP BY id)
    SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
    WHERE d.doc_id % 97 != 0
    """,
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination over a held-out eval slice (docs with
    doc_id % 97 == 0 stand in for the benchmark set, derived
    deterministically from driver data): every remaining corpus doc
    labeled with its count of shingles shared with the benchmark. The
    benchmark shingle set broadcasts; the corpus is never shuffled on
    the shingle."""
    from gnarly_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench)


@register(
    "sim_quantize_int8",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
          FROM v),
    q AS (SELECT vec_id, ROUND(scale, 9) AS scale,
                 list_transform(e, x -> greatest(-127, least(127,
                     CAST(floor(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END)
                                + 0.5) AS INT)))) AS qv
          FROM s)
    SELECT vec_id, scale,
           CAST(len(qv) AS INT) AS n_dims,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           CAST(list_min(qv) AS INT) AS min_q,
           CAST(list_max(qv) AS INT) AS max_q
    FROM q
    """,
)
def sim_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (the storage form of a
    corpus-scale embedding table). The quantization rule floor(x/scale+0.5)
    is engine-portable (no ROUND half-even ambiguity), so the oracle
    re-derives q bit-for-bit; the row returns per-vector aggregates of the
    int8 codes rather than the raw array (representation-independent
    hash)."""
    from gnarly_spark.operators.similarity import quantize_vectors

    q = quantize_vectors(_t(spark, sf_dir, "embeddings"))
    return q.select(
        F.col("id").alias("vec_id"),
        "scale",
        F.size("qvec").alias("n_dims"),
        F.expr("aggregate(qvec, CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("sum_q"),
        F.array_min("qvec").alias("min_q"),
        F.array_max("qvec").alias("max_q"),
    )


@register(
    "text_pack_sequences",
    f"""
    WITH d AS (SELECT doc_id, source,
                      CASE WHEN {_NORM} IS NULL OR {_NORM} = '' THEN 0
                           ELSE len(string_split({_NORM}, ' ')) END AS n_tok,
                      doc_id // 1000 AS chunk
               FROM documents),
    c AS (SELECT *, SUM(n_tok) OVER (PARTITION BY source, chunk
                                     ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           source || '/' || CAST(chunk AS VARCHAR) || '/'
                  || CAST((cum - n_tok) // 2048 AS VARCHAR) AS pack_id
    FROM c
    """,
)
def text_pack_sequences(spark, sf_dir):
    """Sequence packing for training: greedy first-fit of docs into
    fixed-token-budget packs (2048 whitespace tokens) by cumulative token
    count. Deterministic AND distributed: the cumsum window is partitioned
    by (source, doc_id div 1000) — packs never cross a chunk boundary, so
    at corpus scale no single window task sees more than one chunk (the
    slight fill loss at chunk edges is the price of parallelism; a global
    ORDER BY would serialize the corpus through one task).

    Packing rule lives in functions/text.py pack_sequences — the SAME
    helper the composed pipeline_training_corpus consumes."""
    from gnarly_spark.functions.text import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal plumbing (driver-visible: binary payloads synthesized on both
# engines from text, real mapInPandas feature path on the Spark side)
# ---------------------------------------------------------------------------


@register(
    "mm_media_features",
    """
    WITH p AS (SELECT doc_id,
                      CASE WHEN doc_id % 3 = 0 THEN 'RIFFxxxxWAVE' || text
                           WHEN doc_id % 3 = 1 THEN '    ftyp' || text
                           ELSE 'DATA' || text END AS ptxt
               FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'audio/wav'
                WHEN doc_id % 3 = 1 THEN 'video/mp4'
                ELSE 'application/octet-stream' END AS media_type,
           strlen(ptxt) AS n_bytes,
           CAST(('0x' || substring(sha256(ptxt), 1, 2)) AS INT) AS sha_b0
    FROM p
    """,
)
def mm_media_features(spark, sf_dir):
    """The multimodal surface end-to-end on driver data: synthesize binary
    payloads carrying real magic bytes (RIFF/ftyp, ASCII-safe so the
    DuckDB oracle can hash the identical bytes as UTF-8 text), sniff the
    media type JVM-side (media_metadata), then run the REAL Arrow-batched
    mapInPandas decode/feature path (extract_media_features). ``sha_b0``
    recovers byte 0 of the sha256-derived fake feature vector — proving
    the exact payload bytes round-tripped Spark -> Arrow -> Python and
    the deterministic feature math ran on them. The codec stub is the
    only fake part (no media libs in this container); every schema,
    batch, and partition decision is the production one."""
    from gnarly_spark.operators.multimodal import (
        extract_media_features,
        media_metadata,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit("RIFFxxxxWAVE"), F.col("text"))
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("    ftyp"), F.col("text")))
        .otherwise(F.concat(F.lit("DATA"), F.col("text")))
        .alias("ptxt"),
    )
    tagged = media_metadata(
        docs.withColumn("payload", F.encode("ptxt", "UTF-8")), "payload"
    )
    feats = extract_media_features(
        tagged, binary_col="payload", id_col="doc_id", type_col="sniffed_type"
    )
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round((F.element_at("feature", 1) + 0.5) * 255).cast("int").alias("sha_b0"),
    )


# Ranked BPE merge table for the driver-visible count query (literal so the
# DuckDB twin is single-sourced from the same constant; real deployments
# train with train_bpe_merges or load a public merges.txt). Each merge's
# parts exist before it (rank-proper), e.g. ('th','e') needs ('t','h').
_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("an", "d"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("in", "g"), ("o", "u"), ("i", "s"),
    ("t", "o"),
]


def _register_bpe_query() -> None:
    from gnarly_spark.functions.text import bpe_count_sql

    @register(
        "text_bpe_token_count",
        f"SELECT doc_id, {bpe_count_sql(_BPE_MERGES)} AS n_tok FROM documents",
    )
    def text_bpe_token_count(spark, sf_dir):
        """REAL BPE token counting, driver-checked: the ranked merge table
        is applied greedily per word inside one Arrow-batched pandas UDF
        (functions/text.py bpe_token_count); the DuckDB oracle applies the
        SAME merges as chained replace() over the marker representation —
        both sides single-sourced from _BPE_MERGES, so a divergence in
        merge order, boundary handling, or overlap semantics breaks the
        hash. This is the count pack_sequences budgets on when merges are
        passed."""
        from gnarly_spark.functions.text import bpe_token_count

        return bpe_token_count(_t(spark, sf_dir, "documents"), _BPE_MERGES).select(
            F.col("id").alias("doc_id"), "n_tok"
        )


_register_bpe_query()


def _register_bpe_tokenize_query() -> None:
    from gnarly_spark.functions.text import bpe_tokenize_sql

    @register("text_bpe_tokenize", bpe_tokenize_sql(_BPE_MERGES))
    def text_bpe_tokenize(spark, sf_dir):
        """The BPE token STREAM (one row per sub-word token, 1-based pos)
        — what a tokenized-dataset writer materializes. Same single-
        sourced merge table as text_bpe_token_count; the DuckDB twin
        rebuilds the stream with chained replace() + zipped unnests, so
        token boundaries AND order are hash-checked."""
        from gnarly_spark.functions.text import bpe_tokenize

        return bpe_tokenize(_t(spark, sf_dir, "documents"), _BPE_MERGES).select(
            F.col("id").alias("doc_id"), "pos", "token"
        )


_register_bpe_tokenize_query()


@register(
    "dedup_repeated_spans",
    """
    WITH dw AS (SELECT doc_id AS id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                FROM documents),
    sp AS (SELECT id,
                  unnest(range(1, greatest(len(w) - 10 + 1, 0) + 1)) AS pos,
                  unnest([md5(array_to_string(w[g : g + 9], ' '))
                          for g in range(1, greatest(len(w) - 10 + 1, 0) + 1)]) AS span_hash
           FROM dw),
    rep AS (SELECT span_hash, COUNT(DISTINCT id) AS n_docs
            FROM sp GROUP BY span_hash HAVING COUNT(DISTINCT id) >= 2)
    SELECT sp.id AS doc_id, sp.pos, sp.span_hash, rep.n_docs
    FROM sp JOIN rep USING (span_hash)
    """,
)
def dedup_repeated_spans(spark, sf_dir):
    """Exact repeated-substring detection (Lee et al. 2022 shape): every
    (doc, position) whose 10-token span occurs verbatim in >= 2 distinct
    docs. operators/dedup.repeated_spans — explode + lead-window span
    build (one shuffle), md5 span hash, two-phase distinct-doc count, no
    Expand, counts joined back shuffle_hash."""
    from gnarly_spark.operators.dedup import repeated_spans

    return repeated_spans(_t(spark, sf_dir, "documents"), span=10, min_docs=2)


@register(
    "dedup_strip_spans",
    """
    WITH dw AS (SELECT doc_id AS id,
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
                FROM documents),
    sp AS (SELECT id,
                  unnest(range(1, greatest(len(w) - 10 + 1, 0) + 1)) AS pos,
                  unnest([md5(array_to_string(w[g : g + 9], ' '))
                          for g in range(1, greatest(len(w) - 10 + 1, 0) + 1)]) AS span_hash
           FROM dw),
    rep AS (SELECT span_hash, MIN(id) AS keep
            FROM sp GROUP BY span_hash HAVING COUNT(DISTINCT id) >= 2),
    dr AS (SELECT DISTINCT sp.id, unnest(range(sp.pos, sp.pos + 10)) AS p
           FROM sp JOIN rep USING (span_hash) WHERE sp.id <> rep.keep),
    dl AS (SELECT id, list(p) AS drops FROM dr GROUP BY id)
    SELECT dw.id AS doc_id,
           coalesce(array_to_string([w[i] for i in range(1, len(w) + 1)
                            if dl.drops IS NULL OR NOT list_contains(dl.drops, i)],
                           ' '), '') AS clean_text,
           CAST(coalesce(len(dl.drops), 0) AS BIGINT) AS n_removed
    FROM dw LEFT JOIN dl USING (id)
    """,
)
def dedup_strip_spans(spark, sf_dir):
    """The removal step of exact substring dedup: flagged 10-token spans
    are deleted from every doc except the smallest-id keeper per span
    (overlapping intervals union). operators/dedup.strip_repeated_spans;
    the oracle re-derives drop intervals and rebuilds clean text with
    list comprehensions — token order, interval union, keeper choice and
    removal counts are all hash-checked."""
    from gnarly_spark.operators.dedup import strip_repeated_spans

    return strip_repeated_spans(_t(spark, sf_dir, "documents"), span=10, min_docs=2)


@register(
    "mm_image_dims",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                WHEN 2 THEN 'gif' ELSE 'webp' END AS fmt,
           CAST(16 + doc_id % 640 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 480 AS INT) AS height,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 4 ELSE 3 END AS INT) AS channels,
           CAST(8 AS INT) AS bit_depth
    FROM documents
    """,
)
def mm_image_dims(spark, sf_dir):
    """REAL image decode, driver-checked, all four dominant web formats:
    synthesize valid PNG (IHDR, RGBA), JPEG (APP0 + baseline SOF0, 3
    components), GIF (89a logical screen descriptor) and WebP (VP8X
    extended header) byte streams JVM-side with width/height derived from
    doc_id, then recover the dimensions with the pure-Python header
    parsers over Arrow batches (extract_image_dims). The oracle recomputes
    the dims from doc_id directly — a wrong SOF/IHDR/LSD/VP8X offset,
    endianness (PNG/JPEG are BE, GIF/WebP LE), or channel map breaks the
    hash. (Header-building: unhex over lpad(hex(n)) stays entirely in
    whole-stage codegen until the one mapInPandas decode.)"""
    from gnarly_spark.operators.multimodal import extract_image_dims

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    wsql = "CAST(doc_id % 640 + 16 AS INT)"
    hsql = "CAST((doc_id * 7) % 480 + 16 AS INT)"
    w16 = F.lpad(F.hex((F.col("doc_id") % 640 + 16).cast("int")), 4, "0")
    h16 = F.lpad(F.hex(((F.col("doc_id") * 7) % 480 + 16).cast("int")), 4, "0")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" "0000000D" "49484452"),
        F.lpad(w16, 8, "0"),
        F.lpad(h16, 8, "0"),
        F.lit("0806000000"),  # depth 8, color type 6 (RGBA), no interlace
    )
    jpeg_hex = F.concat(
        F.lit("FFD8" "FFE000104A46494600010100000100010000"),  # SOI + APP0
        F.lit("FFC00011" "08"),  # SOF0, len 17, precision 8
        h16,
        w16,
        F.lit("03" "011100" "021101" "031101" "FFD9"),  # 3 components + EOI
    )
    gif_hex = F.concat(
        F.lit("474946383961"),  # GIF89a
        _le_hex(wsql, 2),
        _le_hex(hsql, 2),
        F.lit("700000"),  # packed: color resolution 8, no GCT; bg; aspect
    )
    webp_hex = F.concat(
        # RIFF size 22 LE, WEBP, VP8X chunk size 10 LE, flags 0, reserved
        F.lit("52494646" "16000000" "57454250" "56503858" "0A000000" "00" "000000"),
        _le_hex(f"({wsql} - 1)", 3),
        _le_hex(f"({hsql} - 1)", 3),
    )
    m = (F.col("doc_id") % 4).cast("int")
    payload = F.unhex(
        F.when(m == 0, png_hex)
        .when(m == 1, jpeg_hex)
        .when(m == 2, gif_hex)
        .otherwise(webp_hex)
    )
    return extract_image_dims(docs.withColumn("payload", payload))


def _le_hex(col, nbytes: int):
    """Little-endian hex of an int column (WAV headers are LE; JVM hex()
    is big-endian, so emit bytes low-first)."""
    return F.concat(
        *[
            F.lpad(F.hex(F.pmod(F.expr(f"shiftright({col}, {8 * i})"), F.lit(256))), 2, "0")
            for i in range(nbytes)
        ]
    )


def _be_hex(col, nbytes: int):
    return F.lpad(F.hex(F.expr(col)), 2 * nbytes, "0")


@register(
    "mm_av_metadata",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS fmt,
           CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 30 + 1) * 1000
                     ELSE (doc_id % 240 + 1) * 500 END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 2 END AS INT) AS channels,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 END AS INT) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 END AS INT) AS bit_depth
    FROM documents
    """,
)
def mm_av_metadata(spark, sf_dir):
    """REAL audio/video container metadata, driver-checked: synthesize
    valid WAV (RIFF fmt/data chunks, little-endian) and MP4 (ftyp +
    moov/mvhd v0) headers JVM-side with durations derived from doc_id,
    then recover them with the pure-Python chunk/box walkers over Arrow
    batches (extract_av_metadata). The oracle recomputes the metadata
    from doc_id directly — wrong endianness, chunk alignment, or mvhd
    offsets break the hash."""
    from gnarly_spark.operators.multimodal import extract_av_metadata

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # WAV (even ids, so channels = doc_id%2+1 = 1): 8kHz/16-bit;
    # data_size = byte_rate * seconds -> duration_ms = (doc_id%30+1)*1000
    wav_hex = F.concat(
        F.lit("52494646"),  # RIFF
        _le_hex("36", 4),  # container size (unused by the parser)
        F.lit("57415645" "666D7420"),  # WAVE, 'fmt '
        _le_hex("16", 4),
        _le_hex("1", 2),  # PCM
        _le_hex("doc_id % 2 + 1", 2),
        _le_hex("8000", 4),
        _le_hex(f"CAST(8000 * (doc_id % 2 + 1) * 2 AS BIGINT)", 4),
        _le_hex("CAST((doc_id % 2 + 1) * 2 AS BIGINT)", 2),
        _le_hex("16", 2),
        F.lit("64617461"),  # 'data'
        _le_hex("CAST(8000 * (doc_id % 2 + 1) * 2 * (doc_id % 30 + 1) AS BIGINT)", 4),
    )
    # MP4: 16-byte ftyp + 36-byte moov{mvhd v0, timescale 1000}
    mp4_hex = F.concat(
        F.lit("00000010" "66747970" "69736F6D" "00000000"),
        F.lit("00000024" "6D6F6F76"),  # moov, size 36
        F.lit("0000001C" "6D766864" "00000000" "00000000" "00000000"),
        F.lit("000003E8"),  # timescale 1000
        _be_hex("CAST((doc_id % 240 + 1) * 500 AS BIGINT)", 4),
    )
    payload = F.unhex(
        F.when(F.col("doc_id") % 2 == 0, wav_hex).otherwise(mp4_hex)
    )
    return extract_av_metadata(docs.withColumn("payload", payload))


# ---------------------------------------------------------------------------
# C4-style line-level dedup / boilerplate removal
# ---------------------------------------------------------------------------


# The synthetic documents are single-line word salad, so the line-dedup
# queries demonstrate on a boilerplate-injected derivation (identical
# expression both engines): half the docs get a 2-line cookie/rights
# banner, half a newsletter line, and every doc a shared footer — the
# exact shape C4's line-level dedup exists to strip from web pages.
_BOILERPLATED = """
    SELECT doc_id, CASE WHEN doc_id % 2 = 0
                        THEN 'cookie consent required. all rights reserved. '
                        ELSE 'subscribe to our newsletter. ' END
                   || text || '. powered by sparkgen' AS text
    FROM documents
"""


def _boilerplated_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("cookie consent required. all rights reserved. "),
            ).otherwise(F.lit("subscribe to our newsletter. ")),
            F.col("text"),
            F.lit(". powered by sparkgen"),
        ).alias("text"),
    )


@register(
    "text_line_dedup",
    f"""
    WITH docs2 AS ({_BOILERPLATED}),
    lines AS (SELECT doc_id AS id,
                     trim(lower(unnest(string_split(text, '. ')))) AS skey
              FROM docs2)
    SELECT md5(skey) AS line_hash, COUNT(DISTINCT id) AS n_docs,
           COUNT(*) AS n_total, MIN(id) AS first_doc
    FROM lines GROUP BY 1 HAVING COUNT(DISTINCT id) >= 2
    """,
)
def text_line_dedup(spark, sf_dir):
    """Cross-document duplicate-line census (C4 line dedup, boilerplate
    discovery): one explode + one partial-agg groupBy on the line hash."""
    from gnarly_spark.functions.text import line_dedup_stats

    return line_dedup_stats(_boilerplated_docs(spark, sf_dir), min_docs=2)


@register(
    "text_boilerplate_scrub",
    f"""
    WITH docs2 AS ({_BOILERPLATED}),
    d AS (SELECT doc_id AS id, string_split(text, '. ') AS w FROM docs2),
    lines AS (SELECT id, unnest([{{'pos': g, 'sent': w[g+1]}}
                                 for g in range(0, len(w))]) AS l
              FROM d),
    flat AS (SELECT id, l.pos AS pos, l.sent AS sent,
                    trim(lower(l.sent)) AS skey
             FROM lines),
    hot AS (SELECT skey FROM flat GROUP BY skey
            HAVING COUNT(DISTINCT id) >= 3),
    kept AS (SELECT * FROM flat WHERE skey NOT IN (SELECT skey FROM hot)),
    agg AS (SELECT id, string_agg(sent, '. ' ORDER BY pos) AS clean_text,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY id)
    SELECT d2.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
           len(string_split(d2.text, '. ')) - COALESCE(agg.n_kept, 0) AS n_removed
    FROM docs2 d2 LEFT JOIN agg ON agg.id = d2.doc_id
    """,
)
def text_boilerplate_scrub(spark, sf_dir):
    """Remove lines occurring in >= 3 distinct docs and reassemble each
    doc in order (C4's line-level cleanup): broadcast anti-join against
    the small high-doc-frequency line set; every input doc survives (a
    fully-boilerplate doc keeps empty clean_text). On the injected-banner
    corpus this must strip exactly the banner/footer lines and return
    each doc's original text, proving order-preserving reassembly."""
    from gnarly_spark.functions.text import scrub_boilerplate

    return scrub_boilerplate(_boilerplated_docs(spark, sf_dir), min_docs=3)


# ---------------------------------------------------------------------------
# the full training-corpus pipeline, composed end-to-end
# ---------------------------------------------------------------------------

_PIPE_TRIGRAMS = """SELECT DISTINCT id,
                  unnest([w[g] || ' ' || w[g+1] || ' ' || w[g+2]
                          for g in range(1, greatest(len(w) - 1, 1))]) AS shingle"""


@register(
    "pipeline_training_corpus",
    f"""
    WITH RECURSIVE
    corpus AS (SELECT * FROM documents WHERE doc_id % 97 != 0),
    scored AS (
      SELECT doc_id,
             {_lang_score_sql(["the", "a", "of", "and"])} AS s_en,
             {_lang_score_sql(["der", "die", "und", "das"])} AS s_de,
             {_lang_score_sql(["le", "la", "et", "les"])} AS s_fr,
             {_lang_score_sql(["el", "los", "y", "una"])} AS s_es,
             {_lang_score_sql(["the", "a", "of", "and"])} AS stop,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(text) AS n_chars,
             CASE WHEN {_NORM} = '' THEN 0
                  ELSE len(string_split({_NORM}, ' ')) END AS n_tokens
      FROM corpus),
    q AS (SELECT doc_id,
            CASE WHEN s_en = greatest(s_en,s_de,s_fr,s_es) AND s_en > 0 THEN 'en'
                 WHEN s_de = greatest(s_en,s_de,s_fr,s_es) AND s_de > 0 THEN 'de'
                 WHEN s_fr = greatest(s_en,s_de,s_fr,s_es) AND s_fr > 0 THEN 'fr'
                 WHEN s_es = greatest(s_en,s_de,s_fr,s_es) AND s_es > 0 THEN 'es'
                 ELSE 'und' END AS pred_lang,
            ROUND(0.5 * stop / greatest(n_tokens, 1)
                  + 0.3 * n_alpha / greatest(n_chars, 1)
                  + 0.2 * least(n_tokens, 100) / 100, 6) AS qs
          FROM scored),
    filt AS (SELECT c.doc_id, c.text, c.source FROM corpus c
             JOIN q USING (doc_id)
             WHERE q.qs >= 0.35 AND q.pred_lang = 'en'),
    bw AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w
           FROM documents WHERE doc_id % 97 = 0),
    bsh AS ({_PIPE_TRIGRAMS} FROM bw),
    fw AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w FROM filt),
    fsh AS ({_PIPE_TRIGRAMS} FROM fw),
    hit_ids AS (SELECT DISTINCT f.id FROM fsh f
                JOIN (SELECT DISTINCT shingle FROM bsh) b USING (shingle)),
    clean AS (SELECT * FROM filt
              WHERE doc_id NOT IN (SELECT id FROM hit_ids)),
    csh AS (SELECT * FROM fsh WHERE id NOT IN (SELECT id FROM hit_ids)),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM csh GROUP BY id),
    common AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
               FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.id < b.id
               GROUP BY a.id, b.id),
    jac AS (SELECT id_a, id_b,
                   ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common JOIN sizes sa ON sa.id = id_a
                        JOIN sizes sb ON sb.id = id_b),
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
    clusters AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    keepers AS (SELECT c.doc_id, c.source, c.text FROM clean c
                LEFT JOIN clusters cl ON cl.id = c.doc_id
                WHERE COALESCE(cl.cluster_id, c.doc_id) = c.doc_id),
    d AS (SELECT doc_id, source,
                 CASE WHEN {_NORM} = '' THEN 0
                      ELSE len(string_split({_NORM}, ' ')) END AS n_tok,
                 doc_id // 1000 AS chunk
          FROM keepers),
    c2 AS (SELECT *, SUM(n_tok) OVER (PARTITION BY source, chunk
                                      ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
           FROM d)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           source || '/' || CAST(chunk AS VARCHAR) || '/'
                  || CAST((cum - n_tok) // 2048 AS VARCHAR) AS pack_id
    FROM c2
    """,
)
def pipeline_training_corpus(spark, sf_dir):
    """The WHOLE training-data pipeline as one composed program — the
    product this engine exists to run at 100 TB: held-out benchmark split
    -> quality + language gate (cheap projections FIRST, so the expensive
    shingle ops see the reduced corpus) -> benchmark decontamination
    (broadcast eval-shingle anti-filter) -> near-dup removal (exact
    Jaccard pairs -> connected components -> keep cluster minimum) ->
    token-budget sequence packing. Every stage is the already-oracle-
    checked operator; this row proves they COMPOSE (the pipeline's joins
    stay on doc_id, the only wide relations are the shingle tables, and
    nothing recomputes text twice)."""
    from gnarly_spark.functions.text import lang_id, pack_sequences, quality_features
    from gnarly_spark.operators.dedup import (
        decontaminate,
        duplicate_clusters,
        jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    good = (
        quality_features(corpus)
        .where(F.col("quality_score") >= 0.35)
        .select("doc_id")
    )
    en = (
        corpus.select("doc_id", lang_id(F.col("text")).alias("pl"))
        .where(F.col("pl") == "en")
        .select("doc_id")
    )
    filt = corpus.join(good, "doc_id").join(en, "doc_id")
    uncontaminated = (
        decontaminate(filt, bench)
        .where(~F.col("contaminated"))
        .select("doc_id")
    )
    # clean feeds THREE plan branches (dup pairs, the keep join, the final
    # pack join) — checkpoint so the quality/lang/decontamination subtree
    # runs once, not once per branch (the same rule minhash_lsh_pairs
    # applies to its shingle relation)
    clean = filt.join(uncontaminated, "doc_id").localCheckpoint(eager=True)
    clusters = duplicate_clusters(jaccard_pairs(clean, threshold=0.5))
    # clusters and keep are O(corpus) worst-case with inherited checkpoint
    # stats — pin distributed (see dedup_keep_list)
    keep = (
        clean.select("doc_id")
        .join(
            clusters.withColumnRenamed("id", "doc_id").hint("shuffle_hash"),
            "doc_id",
            "left",
        )
        .where(F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id"))
        .select("doc_id")
    )
    # pack the surviving docs with the SAME rule the standalone
    # text_pack_sequences query is oracle-checked against (one shared
    # helper — the composed pipeline cannot silently diverge from it)
    return pack_sequences(clean.join(keep.hint("shuffle_hash"), "doc_id"))


@register(
    "text_source_cap",
    """
    SELECT doc_id, source, rank FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents) WHERE rank <= 10
    """,
)
def text_source_cap(spark, sf_dir):
    """Per-source document cap — the anti-spam 'domain cap' of web-corpus
    pipelines: keep at most K docs per source, best-first (n_chars here;
    any quality column slots in), deterministic tie-break on doc_id. One
    window over the source partition — the only exchange is the
    partition-by-source shuffle, and at 100 TB the cap bounds any single
    domain's contribution no matter how many pages it published."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return d.select(
        "doc_id", "source", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= 10)


@register(
    "text_lm_quality",
    f"""
    WITH toks AS (SELECT id, w FROM (
                    SELECT doc_id AS id, unnest(string_split({_NORM}, ' ')) AS w
                    FROM documents) WHERE w != ''),
    vocab AS (SELECT w, COUNT(*)::DOUBLE AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM vocab),
    scored AS (SELECT id, ROUND(AVG(-ln(c / t)), 6) AS lm_score,
                      COUNT(*) AS n_tokens
               FROM toks JOIN vocab USING (w), tot GROUP BY id)
    SELECT d.doc_id, s.lm_score,
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN scored s ON s.id = d.doc_id
    """,
)
def text_lm_quality(spark, sf_dir):
    """Average token surprisal under the corpus's own unigram LM (CCNet's
    quality-filter shape without an external model) — see
    functions/text.py lm_quality for the scale notes."""
    from gnarly_spark.functions.text import lm_quality

    return lm_quality(_t(spark, sf_dir, "documents"))


def mixture_sample(
    docs,
    weight,
    budget_num: int = 1,
    budget_den: int = 2,
    token_col: str = "n_chars",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Deterministic mixture sampling: downsample each source so the kept
    corpus approaches a target per-source token share (the domain-mixing
    step of web-corpus curation — Pile/DoReMi-style source weights).

    ``weight`` is an integer Column giving the target weight of the row's
    source; the token budget is ``budget_num/budget_den`` of the corpus
    total. Source s is sampled at rate min(1, w_s*B / (W*tok_s)) — clamped
    when the budget asks for more tokens than the source has (the standard
    under-delivery case, surfaced via the `clamped` flag).

    Engine-portable determinism: acceptance is an INTEGER comparison
      u32(doc_id) * tok_s * W  <  w_s * B * 2^32
    (u32 = first 8 md5 hex digits) carried in decimal(38,0) — no float
    division, so any engine replays the exact same keep-set for a given
    corpus. Appends rebalance rates (B and tok_s move), but a kept doc can
    only flip when its source's rate falls — the hash-threshold rule makes
    keep-sets NESTED across rate changes (shrinking a rate keeps a subset,
    never a reshuffle). The clamp is implicit: w_s*B >= tok_s*W accepts
    every u32.

    Scale shape: one groupBy(source) agg for totals (tiny — one row per
    source), rates broadcast back onto the corpus, acceptance is a
    stateless map-side filter. Two scans of the corpus, zero corpus
    shuffles."""
    d = docs.withColumn("_w", weight.cast("long"))
    totals = d.groupBy(source_col).agg(
        F.sum(token_col).cast("long").alias("_tok"),
        F.max("_w").alias("_sw"),
    )
    grand = totals.agg(
        F.sum("_tok").alias("_T"), F.sum("_sw").alias("_W")
    )
    rates = totals.crossJoin(F.broadcast(grand)).select(
        source_col,
        "_tok",
        "_sw",
        "_W",
        F.expr(f"(_T * {budget_num}) div {budget_den}").alias("_budget"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    dec = "decimal(38,0)"
    return (
        docs.join(F.broadcast(rates), source_col)
        .where(
            u32.cast(dec) * F.col("_tok").cast(dec) * F.col("_W").cast(dec)
            < F.col("_sw").cast(dec)
            * F.col("_budget").cast(dec)
            * F.lit(4294967296).cast(dec)
        )
        .withColumn(
            "clamped", F.col("_sw") * F.col("_budget") >= F.col("_tok") * F.col("_W")
        )
    )


@register(
    "text_mixture_sample",
    """
    WITH w AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok,
                      CASE WHEN source IN ('src0','src1','src2','src3')
                           THEN 5 ELSE 1 END AS wt
               FROM documents GROUP BY source),
    g AS (SELECT CAST(SUM(tok) AS BIGINT) AS T, CAST(SUM(wt) AS BIGINT) AS W FROM w),
    r AS (SELECT source, tok, wt, W, (T * 1) // 2 AS budget FROM w, g),
    s AS (SELECT d.source, d.doc_id, d.n_chars, r.wt, r.tok, r.W, r.budget
          FROM documents d JOIN r USING (source)
          WHERE CAST(CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) AS HUGEINT) * tok * W
                < CAST(wt AS HUGEINT) * budget * 4294967296)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS tokens_sampled,
           MAX(wt * budget >= tok * W) AS clamped
    FROM s GROUP BY source
    """,
)
def text_mixture_sample(spark, sf_dir):
    """Per-source summary of a deterministic mixture sample: sources
    src0-src3 carry weight 5, the rest weight 1, budget = half the corpus
    tokens — so the upweighted sources clamp at keep-everything while the
    long tail is hash-downsampled toward its share (see mixture_sample)."""
    d = _t(spark, sf_dir, "documents")
    wt = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3"), F.lit(5)
    ).otherwise(F.lit(1))
    return (
        mixture_sample(d, wt)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("tokens_sampled"),
            F.max("clamped").alias("clamped"),
        )
    )


@register(
    "text_inverted_index",
    f"""
    WITH toks AS (SELECT DISTINCT id, token FROM (
                    SELECT doc_id AS id,
                           unnest(string_split({_NORM}, ' ')) AS token
                    FROM documents) WHERE token != '')
    SELECT token, COUNT(*) AS doc_freq,
           string_agg(CAST(id AS VARCHAR), ',' ORDER BY CAST(id AS VARCHAR))
             AS postings
    FROM toks GROUP BY token HAVING COUNT(*) >= 2
    """,
)
def text_inverted_index(spark, sf_dir):
    """Full-text inverted index over the corpus (token → doc_freq +
    sorted posting list), min_df=2 band — see functions/text.py
    inverted_index for the max_df stopword guard that bounds the hot
    token's posting row at web scale."""
    from gnarly_spark.functions.text import inverted_index

    return inverted_index(_t(spark, sf_dir, "documents"), min_df=2)


@register(
    "text_tfidf_search",
    f"""
    WITH toks AS (SELECT doc_id AS id, unnest(string_split({_NORM}, ' ')) AS w
                  FROM documents),
    tw AS (SELECT id, w, COUNT(*) AS tf FROM toks
           WHERE w IN ('batch', 'join', 'stream') GROUP BY id, w),
    dfr AS (SELECT w, COUNT(*) AS df FROM tw GROUP BY w),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents)
    SELECT id AS doc_id,
           ROUND(SUM(tf * ln(n / df)), 6) AS score,
           COUNT(*) AS n_terms
    FROM tw JOIN dfr USING (w), n GROUP BY id
    """,
)
def text_tfidf_search(spark, sf_dir):
    """TF-IDF ranked retrieval for a fixed 3-term query — every matching
    doc with its score (no top-k cutoff: engine ULP near-ties can't flip
    membership). The ranking consumer applies its own limit."""
    from gnarly_spark.functions.text import tfidf_search

    return tfidf_search(
        _t(spark, sf_dir, "documents"), ["batch", "join", "stream"]
    )


# ---------------------------------------------------------------------------
# mergeable cardinality sketches (HyperLogLog) — corpus census at crawl scale
# ---------------------------------------------------------------------------

def _hll_events_src_sql() -> str:
    return (
        "SELECT event_type, 'https://u/' || CAST(user_id AS VARCHAR) AS url "
        "FROM events"
    )


def _register_hll_queries() -> None:
    from gnarly_spark.functions.sketches import hll_oracle_sql

    hll_sql = hll_oracle_sql(
        _hll_events_src_sql(), "url", ("event_type",), p=9
    )

    @register(
        "sketch_hll_distinct",
        f"""
        WITH hll AS ({hll_sql}),
        ex AS (SELECT event_type, COUNT(DISTINCT url) AS exact_distinct
               FROM ({_hll_events_src_sql()}) GROUP BY event_type)
        SELECT ex.event_type, exact_distinct, hll_distinct,
               ROUND(abs(hll_distinct - CAST(exact_distinct AS DOUBLE))
                     / CAST(exact_distinct AS DOUBLE) * 100.0, 2) AS err_pct
        FROM ex JOIN hll ON ex.event_type = hll.event_type
        """,
    )
    def sketch_hll_distinct(spark, sf_dir):
        """Distinct urls per event_type via an engine-portable HyperLogLog
        (p=9, m=512) next to the exact count — the oracle re-derives the
        md5 registers AND the estimator, so the approximate value itself is
        hash-checked exactly. At 100 TB the sketch replaces the full
        distinct-key shuffle with <= 512 register rows per group per map
        partition (see functions/sketches.py)."""
        from gnarly_spark.functions.sketches import hll_distinct

        e = _t(spark, sf_dir, "events").select(
            "event_type",
            F.concat(F.lit("https://u/"), F.col("user_id").cast("string")).alias("url"),
        )
        est = hll_distinct(e, "url", ("event_type",), p=9)
        exact = e.groupBy("event_type").agg(
            F.countDistinct("url").alias("exact_distinct")
        )
        err = F.round(
            F.abs(F.col("hll_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
            * F.lit(100.0),
            2,
        )
        return exact.join(est, "event_type").select(
            "event_type", "exact_distinct", "hll_distinct", err.alias("err_pct")
        )

    # p=9 constants inlined below: width = 23, 2^23 = 8388608, w=0 -> rho 24
    _REGS_P9 = """
    h AS (SELECT source,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) AS h32
          FROM documents WHERE doc_id IS NOT NULL),
    rr AS (SELECT source, h32 // 8388608 AS register, h32 % 8388608 AS w
           FROM h),
    per_src AS (SELECT source, register,
                       MAX(CASE WHEN w = 0 THEN 24
                                ELSE 23 - length(bin(w)) + 1 END) AS max_rho
                FROM rr GROUP BY source, register),
    merged AS (SELECT register, MAX(max_rho) AS max_rho
               FROM per_src GROUP BY register),
    direct AS (SELECT register,
                      MAX(CASE WHEN w = 0 THEN 24
                               ELSE 23 - length(bin(w)) + 1 END) AS max_rho
               FROM rr GROUP BY register)
    """

    def _est_p9(rel: str) -> str:
        from gnarly_spark.functions.sketches import _K, _alpha_mm_2k

        amm = repr(_alpha_mm_2k(9))
        return f"""
        (SELECT ROUND(CASE WHEN e_raw <= 1280.0 AND v > 0
                           THEN 512.0 * ln(512.0 / CAST(v AS DOUBLE))
                           ELSE e_raw END, 2)
         FROM (SELECT (512 - COUNT(*)) AS v,
                      {amm} / CAST(
                        CAST(SUM(CAST(2 AS BIGINT) ** ({_K} - max_rho)) AS BIGINT)
                        + (512 - COUNT(*)) * {1 << _K} AS DOUBLE) AS e_raw
               FROM {rel}))
        """

    @register(
        "sketch_hll_merge",
        f"""
        WITH {_REGS_P9}
        SELECT (SELECT COUNT(DISTINCT doc_id) FROM documents) AS exact_distinct,
               {_est_p9("merged")} AS merged_distinct,
               {_est_p9("direct")} AS direct_distinct
        """,
    )
    def sketch_hll_merge(spark, sf_dir):
        """Sketch MERGEABILITY, the property that makes HLL the 100 TB
        distinct-count: per-source register tables (the shape you'd persist
        per crawl segment / per day) roll up with a plain max-per-register
        into the sketch of the union — merged estimate == the
        direct-over-everything estimate, without rereading raw data. One
        row: (exact_distinct, merged_distinct, direct_distinct)."""
        from gnarly_spark.functions.sketches import hll_add, hll_estimate, hll_merge

        d = _t(spark, sf_dir, "documents").select(
            "source", F.col("doc_id").cast("string").alias("k")
        )
        per_src = hll_add(d, "k", ("source",), p=9)
        merged = hll_estimate(hll_merge(per_src), (), p=9).select(
            F.col("hll_distinct").alias("merged_distinct")
        )
        direct = hll_estimate(hll_add(d, "k", (), p=9), (), p=9).select(
            F.col("hll_distinct").alias("direct_distinct")
        )
        exact = d.agg(F.countDistinct("k").alias("exact_distinct"))
        return exact.crossJoin(merged).crossJoin(direct)


_register_hll_queries()


def _register_cms_query() -> None:
    _CMS_D, _CMS_W = 4, 64  # w < distinct keys at sf0.01 so collisions are real

    @register(
        "sketch_cms_topk",
        f"""
        WITH src AS (SELECT 'https://u/' || CAST(user_id AS VARCHAR) AS url
                     FROM events),
        hashes AS (SELECT url, i,
                          CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || url), 1, 8))
                               AS BIGINT) % {_CMS_W} AS col
                   FROM src, range({_CMS_D}) t(i)),
        counters AS (SELECT i AS row, col, COUNT(*) AS cnt
                     FROM hashes GROUP BY i, col),
        exact AS (SELECT url, COUNT(*) AS exact_count FROM src GROUP BY url
                  ORDER BY exact_count DESC, url LIMIT 10),
        probe AS (SELECT url, i,
                         CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || url), 1, 8))
                              AS BIGINT) % {_CMS_W} AS col
                  FROM exact, range({_CMS_D}) t(i)),
        est AS (SELECT p.url, MIN(c.cnt) AS cms_count
                FROM probe p JOIN counters c ON c.row = p.i AND c.col = p.col
                GROUP BY p.url)
        SELECT e.url, e.exact_count, est.cms_count,
               est.cms_count - e.exact_count AS overcount
        FROM exact e JOIN est ON e.url = est.url
        """,
    )
    def sketch_cms_topk(spark, sf_dir):
        """Count-min heavy hitters: frequency estimates for the exact top-10
        urls from a d=4 x w=64 counter sketch (deliberately narrower than
        the key universe so collisions — and the one-sided overcount — are
        visible in the driver row values). All-integer math: the oracle
        matches exactly, not approximately. At 100 TB the sketch's shuffle
        is bounded at d*w counter rows per map partition however many
        events stream through (functions/sketches.py cms_build)."""
        from gnarly_spark.functions.sketches import cms_build, cms_estimate

        d, w = _CMS_D, _CMS_W
        e = _t(spark, sf_dir, "events").select(
            F.concat(F.lit("https://u/"), F.col("user_id").cast("string")).alias("url")
        )
        cms = cms_build(e, "url", d=d, w=w)
        exact = (
            e.groupBy("url")
            .agg(F.count("*").alias("exact_count"))
            .orderBy(F.desc("exact_count"), "url")
            .limit(10)
        )
        est = cms_estimate(cms, exact.select("url"), "url", d=d, w=w)
        return exact.join(est, "url").select(
            "url",
            "exact_count",
            "cms_count",
            (F.col("cms_count") - F.col("exact_count")).alias("overcount"),
        )


_register_cms_query()


def _register_gopher_query() -> None:
    def _gram_cte(n: int) -> str:
        parts = " || ' ' || ".join(f"w[g+{j}]" for j in range(n))
        return f"""
    g{n} AS (SELECT id, unnest([{parts}
                                for g in range(1, greatest(len(w) - {n} + 2, 1))]) AS g
             FROM dn),
    per{n} AS (SELECT id,
                      ROUND((SUM(c) - COUNT(*)) / SUM(c), 6) AS dup{n},
                      ROUND(MAX(c) / SUM(c), 6) AS top{n}
               FROM (SELECT id, g, COUNT(*) AS c FROM g{n} GROUP BY id, g)
               GROUP BY id)"""

    @register(
        "text_gopher_repetition",
        f"""
        WITH dn AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w
                    FROM documents),
        {_gram_cte(2)},
        {_gram_cte(3)}
        SELECT d.doc_id,
               coalesce(dup2, 0.0) AS dup2, coalesce(top2, 0.0) AS top2,
               coalesce(dup3, 0.0) AS dup3, coalesce(top3, 0.0) AS top3
        FROM documents d
        LEFT JOIN per2 ON per2.id = d.doc_id
        LEFT JOIN per3 ON per3.id = d.doc_id
        """,
    )
    def text_gopher_repetition(spark, sf_dir):
        """Gopher/MassiveText within-doc repetition gate: duplicate- and
        top-n-gram fractions (n=2,3) per document — the quality rule that
        catches machine-generated/template spam INSIDE one doc, which
        cross-doc dedup can't see. See functions/text.py
        gopher_repetition for the scale shape (per-doc bounded, no
        cross-doc join)."""
        from gnarly_spark.functions.text import gopher_repetition

        return gopher_repetition(_t(spark, sf_dir, "documents"), ns=(2, 3))


_register_gopher_query()


@register(
    "text_unigram_surprisal",
    f"""
    WITH tok AS (SELECT id, t FROM (
           SELECT doc_id AS id, unnest(string_split({_NORM}, ' ')) AS t
           FROM documents) WHERE t != ''),
    vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
    s AS (SELECT t, CAST(length(bin(n // c)) - 1 AS BIGINT) AS s
          FROM vocab, tot),
    per AS (SELECT id, COUNT(*) AS n_tokens, CAST(SUM(s.s) AS BIGINT) AS ssum
            FROM tok JOIN s USING (t) GROUP BY id)
    SELECT d.doc_id,
           COALESCE(n_tokens, 0) AS n_tokens,
           COALESCE(ROUND(ssum / n_tokens, 6), 0.0) AS surprisal
    FROM documents d LEFT JOIN per ON per.id = d.doc_id
    """,
)
def text_unigram_surprisal(spark, sf_dir):
    """Corpus-self-trained unigram LM score (integer log2 surprisal,
    engine-exact — see functions/text.py unigram_surprisal): the CCNet-
    style quality gate that catches boilerplate (too-low) and gibberish
    (too-high) docs that n-gram repetition and dedup both miss."""
    from gnarly_spark.functions.text import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"))


@register(
    "text_chunk_passages",
    f"""
    WITH dn AS (SELECT doc_id, string_split({_NORM}, ' ') AS w
                FROM documents),
    ok AS (SELECT doc_id, w,
                  1 + (greatest(len(w) - 64, 0) + 47) // 48 AS nw
           FROM dn WHERE len(w) > 0 AND w[1] != ''),
    ex AS (SELECT doc_id,
                  unnest([struct_pack(i := g - 1,
                                      c := w[(g-1)*48 + 1 : (g-1)*48 + 64])
                          for g in range(1, nw + 1)]) AS u
           FROM ok)
    SELECT doc_id, u.i AS chunk_idx,
           CAST(len(u.c) AS BIGINT) AS n_tokens,
           array_to_string(u.c, ' ') AS chunk_text
    FROM ex
    """,
)
def text_chunk_passages(spark, sf_dir):
    """Sliding-window passage chunking (functions/text.py chunk_passages:
    64-token windows, stride 48): map-only — split + transform + one
    explode, zero shuffles; the long-doc -> training-passage prep step."""
    from gnarly_spark.functions.text import chunk_passages

    return chunk_passages(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    ).withColumnRenamed("id", "doc_id")


def _register_bottomk_query() -> None:
    from gnarly_spark.functions.sketches import bottomk_oracle_sql

    @register(
        "sketch_bottomk_quantiles",
        bottomk_oracle_sql(
            "documents", "doc_id", "n_chars", "source", k=48, qs=(0.5, 0.9)
        ),
    )
    def sketch_bottomk_quantiles(spark, sf_dir):
        """Doc-length p50/p90 per source from a bottom-k sketch (k=48): the
        k hash-smallest doc_ids form a deterministic uniform sample, so the
        estimate — unlike percentile_approx's — is partitioning-independent
        and the oracle re-derives sample AND quantiles bit-for-bit. At
        100 TB the shuffle carries k rows per group instead of the column;
        per-day sketches roll up exactly (bottomk_merge, tested)."""
        from gnarly_spark.functions.sketches import (
            bottomk_quantiles,
            bottomk_sketch,
        )

        sk = bottomk_sketch(
            _t(spark, sf_dir, "documents"),
            "doc_id",
            "n_chars",
            ("source",),
            k=48,
        )
        return bottomk_quantiles(sk, (0.5, 0.9)).select(
            "source", "n_sample", "est_p50", "est_p90"
        )


_register_bottomk_query()


@register(
    "text_bigram_surprisal",
    f"""
    WITH dn AS (SELECT doc_id AS id,
                       list_filter(string_split({_NORM}, ' '),
                                   x -> x != '') AS w
                FROM documents),
    tok AS (SELECT id, unnest(w) AS t FROM dn),
    vocab AS (SELECT t, COUNT(*) AS cu FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM vocab),
    pc AS (SELECT id, u.p AS p, u.c AS c FROM (
             SELECT id, unnest([struct_pack(p := w[g], c := w[g+1])
                                for g in range(1, len(w))]) AS u
             FROM dn WHERE len(w) >= 2)),
    cb AS (SELECT p, c, COUNT(*) AS cb FROM pc
           GROUP BY p, c HAVING COUNT(*) >= 2),
    seen AS (SELECT cb.p, cb.c,
                    CAST(length(bin(v.cu // cb.cb)) - 1 AS BIGINT) AS s_seen
             FROM cb JOIN vocab v ON v.t = cb.p),
    back AS (SELECT t AS c, CAST(length(bin(n // cu)) AS BIGINT) AS s_back
             FROM vocab, tot),
    scored AS (SELECT id, COALESCE(s_seen, s_back) AS s,
                      CASE WHEN s_seen IS NULL THEN 1 ELSE 0 END AS backed
               FROM pc LEFT JOIN seen ON seen.p = pc.p AND seen.c = pc.c
                       JOIN back ON back.c = pc.c),
    per AS (SELECT id, COUNT(*) AS n_trans,
                   CAST(SUM(s) AS BIGINT) AS ssum,
                   CAST(SUM(backed) AS BIGINT) AS nback
            FROM scored GROUP BY id)
    SELECT d.doc_id,
           COALESCE(n_trans, 0) AS n_transitions,
           COALESCE(ROUND(ssum / n_trans, 6), 0.0) AS surprisal,
           COALESCE(ROUND(nback / n_trans, 6), 0.0) AS backoff_frac
    FROM documents d LEFT JOIN per ON per.id = d.doc_id
    """,
)
def text_bigram_surprisal(spark, sf_dir):
    """Bigram Stupid-Backoff LM quality score (integer log2 buckets,
    engine-exact — functions/text.py bigram_surprisal): flags word-salad
    docs whose common words appear in implausible ORDER, the failure mode
    the unigram gate can't see; backoff_frac doubles as a gibberish
    signal."""
    from gnarly_spark.functions.text import bigram_surprisal

    return bigram_surprisal(_t(spark, sf_dir, "documents"))


_DSIR_TARGET = "('src0', 'src1', 'src2', 'src3')"


@register(
    "text_dsir_weights",
    f"""
    WITH dn AS (SELECT doc_id AS id,
                       CAST(source IN {_DSIR_TARGET} AS BIGINT) AS tgt,
                       list_filter(string_split({_NORM}, ' '),
                                   x -> x != '') AS w
                FROM documents),
    g AS (SELECT id, tgt,
                 CAST(('0x' || substring(md5(u.p || ' ' || u.c), 1, 8))
                      AS BIGINT) % 1024 AS k
          FROM (SELECT id, tgt,
                       unnest([struct_pack(p := w[i], c := w[i+1])
                               for i in range(1, len(w))]) AS u
                FROM dn WHERE len(w) >= 2)),
    st AS (SELECT k, COUNT(*) AS cnt_r,
                  CAST(SUM(tgt) AS BIGINT) AS cnt_t
           FROM g GROUP BY k),
    tot AS (SELECT CAST(SUM(cnt_r) AS BIGINT) AS r_tot,
                   CAST(SUM(cnt_t) AS BIGINT) AS t_tot FROM st),
    lam AS (SELECT k,
                   CAST(length(bin(greatest(
                       ((cnt_t + 1) * (((r_tot + 1024) * 1048576)
                                       // (t_tot + 1024))) // (cnt_r + 1),
                       1))) - 1 - 20 AS BIGINT) AS lam
            FROM st, tot),
    per AS (SELECT id, COUNT(*) AS n_grams,
                   CAST(SUM(lam) AS BIGINT) AS logw
            FROM g JOIN lam USING (k) GROUP BY id)
    SELECT d.doc_id,
           COALESCE(n_grams, 0) AS n_grams,
           COALESCE(logw, 0) AS dsir_logw
    FROM documents d LEFT JOIN per ON per.id = d.doc_id
    """,
)
def text_dsir_weights(spark, sf_dir):
    """DSIR domain-matching importance weights (functions/text.py
    dsir_weights — hashed-bigram bag, integer log2 ratio buckets,
    engine-exact): target exemplars = the four 'src0'-'src3' sources,
    raw = the whole corpus. The selection step between quality gates and
    mixture sampling; threshold on dsir_logw downstream (no global sort
    here)."""
    from gnarly_spark.functions.text import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(
        docs, F.col("source").isin("src0", "src1", "src2", "src3")
    )


# ---------------------------------------------------------------------------
# KMV set-resemblance (functions/sketches.py kmv_jaccard)
# ---------------------------------------------------------------------------

# two overlapping url sets derived from events: residues mod 4001 (even
# event ids) vs the same space shifted +2000 (event ids % 3 = 0) — ~1/3
# true Jaccard, and both |A| and |B| exceed k so the sketch actually
# estimates instead of degenerating to the exact set.
_KMV_K = 256
_KMV_A_SQL = (
    "SELECT DISTINCT 'https://u/' || CAST(event_id % 4001 AS VARCHAR) AS id "
    "FROM events WHERE event_id % 2 = 0"
)
_KMV_B_SQL = (
    "SELECT DISTINCT 'https://u/' || CAST(event_id % 4001 + 2000 AS VARCHAR) AS id "
    "FROM events WHERE event_id % 3 = 0"
)


@register(
    "sketch_kmv_jaccard",
    f"""
    WITH a AS ({_KMV_A_SQL}),
    b AS ({_KMV_B_SQL}),
    ka AS (SELECT md5(id) AS h FROM a ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT md5(id) AS h FROM b ORDER BY h LIMIT {_KMV_K}),
    u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
          ORDER BY h LIMIT {_KMV_K}),
    inter AS (SELECT CAST(COUNT(*) AS INT) AS n FROM u
              WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
    ex AS (SELECT CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS ni,
                  COUNT(*) AS nu
           FROM (SELECT a.id IS NOT NULL AS ina, b.id IS NOT NULL AS inb
                 FROM a FULL OUTER JOIN b ON a.id = b.id))
    SELECT (SELECT CAST(COUNT(*) AS INT) FROM u) AS k_union,
           (SELECT n FROM inter) AS n_both,
           CAST((SELECT n FROM inter) AS DOUBLE)
             / (SELECT COUNT(*) FROM u) AS jaccard_est,
           CAST(ni AS DOUBLE) / nu AS jaccard_exact
    FROM ex
    """,
)
def sketch_kmv_jaccard(spark, sf_dir):
    """Corpus-overlap probe via KMV bottom-k set sketches (Beyer et al.
    2007): Jaccard between two url sets estimated from three k-row
    arrays — the estimator itself is deterministic (md5 order), so the
    oracle re-derives the ESTIMATE bit-for-bit, alongside the exact
    Jaccard for reference. At 10^10 rows the exact number needs a full
    distinct join of both corpora; the sketch needs one distinct +
    mergeable per-partition bottom-k per side. Covers
    functions/sketches.py kmv_set_sketch/kmv_jaccard."""
    from gnarly_spark.functions.sketches import kmv_jaccard

    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_id") % 2 == 0).select(
        F.concat(
            F.lit("https://u/"), (F.col("event_id") % 4001).cast("string")
        ).alias("id")
    )
    b = e.where(F.col("event_id") % 3 == 0).select(
        F.concat(
            F.lit("https://u/"), (F.col("event_id") % 4001 + 2000).cast("string")
        ).alias("id")
    )
    est = kmv_jaccard(a, b, "id", k=_KMV_K)
    ad = a.distinct().withColumn("_ina", F.lit(True))
    bd = b.distinct().withColumn("_inb", F.lit(True))
    ex = (
        ad.join(bd, "id", "full")
        .agg(
            F.sum(
                F.when(F.col("_ina") & F.col("_inb"), 1).otherwise(0)
            ).cast("bigint").alias("ni"),
            F.count(F.lit(1)).alias("nu"),
        )
        .select(
            (F.col("ni").cast("double") / F.col("nu")).alias("jaccard_exact")
        )
    )
    return est.crossJoin(ex)
