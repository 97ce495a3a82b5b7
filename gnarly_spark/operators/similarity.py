"""Similarity search over embedding columns (array<float>).

Net-new training-data capability (nothing comparable in the reference).
Two paths:

- `cosine_topk` — brute-force exact top-k: query set × corpus, dot product
  via JVM-side array expressions (F.zip_with + F.aggregate — whole-stage
  codegen, no Python). Correct baseline; O(|Q|·|C|) — fine when the query
  set is broadcastable, which is the common "find neighbors of this batch"
  shape.
- `lsh_ann_topk` — random-hyperplane LSH: sign-bit sketches bucket the
  corpus; only same-bucket (or small-hamming-radius) candidates get exact
  scoring. The 100 TB path: the corpus is scanned once to build sketches,
  candidate generation is an equi-join on bucket id. Hyperplanes derive
  deterministically from a seed via SHA2 so plans are reproducible.

Floats: cosine is rounded (6 dp) and ties break on vec_id so top-k is a
strict total order (oracle-comparable).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(a):
    """float[] -> double[]: keeps the whole dot product in float64 so the
    result is bit-identical to any engine doing sequential float64 math
    (oracle comparability; also avoids float32 cancellation)."""
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_per_query(
    scored: DataFrame, order_cols, k: int, query_col: str = "query_id"
) -> DataFrame:
    """Two-phase per-query top-k rank: local top-k per (input partition,
    query), then a global merge rank over the <= k * n_partitions
    survivors per query. Adds column ``rank`` (1-based, <= k).

    Why not one ``Window.partitionBy(query_col)`` over the scored
    relation: that routes EVERY scored corpus row for a query into a
    single task's sort — fine at sf0.1, a scale killer at 1e10 corpus
    rows (PQ-ADC scores the whole corpus per query). Same
    partials-then-tiny-merge shape as the ungrouped bottom-k sketch
    (functions/sketches.py bottomk_sketch). Results are bit-identical to
    the single-window rank: every global top-k row is in the top-k of
    its own partition, and ``order_cols`` must be a total order (ties
    broken by an id column) so both phases sort deterministically.

    The local window's exchange hashes on (_pid, query) — parallelism is
    n_partitions × n_queries small sorted groups instead of one
    corpus-sized group per query; shuffle volume is unchanged.
    """
    lw = Window.partitionBy("_pid", query_col).orderBy(*order_cols)
    gw = Window.partitionBy(query_col).orderBy(*order_cols)
    return (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrk", F.row_number().over(lw))
        .where(F.col("_lrk") <= k)
        .withColumn("rank", F.row_number().over(gw))
        .where(F.col("rank") <= k)
        .drop("_pid", "_lrk")
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Output: (query_id, neighbor_id, cos, rank). The query side is tiny =>
    broadcast; the corpus is scanned once, never shuffled.
    """
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return topk_per_query(
        scored, [F.desc("cos"), F.col("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cos", "rank")


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Brute force — bound with max_id or swap in lsh_ann candidates at scale.
    """
    e = embeddings
    if max_id is not None:
        e = e.where(F.col(id_col) < max_id)
    a = e.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = e.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-LSH embedding near-dup pairs — the scale path for
    `neardup_pairs` (which is brute-force O(n²)). Candidates = pairs that
    agree on ALL bits of at least one band (n_planes/bands bits per band),
    generated by a banded equi-join; only candidates get the exact cosine,
    and only cos >= threshold survives. Precision is exact; recall is the
    standard LSH band bound 1-(1-p^r)^b (p = 1 - angle/pi per sign bit) —
    raise `bands` for recall, raise bits-per-band for selectivity.

    Shape at 10^10 vectors: the corpus is scanned once to build b band
    keys per vector (JVM codegen dot products, no Python), candidates come
    from one shuffle on (band, band_val) — never an all-pairs product —
    and the exact verify joins vectors back by id (shuffle_hash: the
    corpus is never broadcast). `max_bucket` applies `cap_hot_bands` to
    bound the quadratic term of degenerate buckets (zero vectors /
    boilerplate embeddings); off by default so small-corpus answers are
    exactly the banded semantics the oracle replays.
    """
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    r = n_planes // bands
    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("neardup_pairs_lsh: empty corpus (or NULL leading vector)")
    planes = _hyperplanes(len(head[0]), n_planes, seed)
    bits = [
        _dot(F.col("v"), F.array(*[F.lit(float(x)) for x in p])) > 0 for p in planes
    ]
    band_vals = [
        sum(
            (F.when(bits[b * r + j], F.lit(1 << j)).otherwise(F.lit(0)) for j in range(r)),
            F.lit(0),
        ).cast("long")
        for b in range(bands)
    ]
    sk = embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).select("id", F.posexplode(F.array(*band_vals)).alias("band", "band_key"))
    if max_bucket is not None:
        from gnarly_spark.operators.dedup import cap_hot_bands

        sk = cap_hot_bands(sk, max_bucket)
    left = sk.select(F.col("id").alias("id_a"), "band", "band_key")
    right = sk.select(F.col("id").alias("id_b"), "band", "band_key")
    cand = (
        left.join(right.hint("shuffle_hash"), ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # per-vector norm computed ONCE here, not once per candidate pair
    # (same doubles, same division order as cosine() — hash-identical to
    # the oracle; the verify cost drops from 3 array folds per pair to 1)
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_nrm", _norm(F.col("_v")))
    # hint the CANDIDATE side, not the corpus: the shuffle_hash hint marks
    # the hash-BUILD side, and at 10^10 vectors building on the corpus's
    # wide double arrays is the executor-memory cliff dedup.py documents
    # avoiding (banded candidates are orders of magnitude smaller)
    fetched = (
        cand.hint("shuffle_hash")
        .join(vecs, cand.id_a == vecs._vid)
        .select("id_a", "id_b", F.col("_v").alias("va"), F.col("_nrm").alias("na"))
    )
    return (
        fetched.hint("shuffle_hash")
        .join(vecs, F.col("id_b") == vecs._vid)
        .withColumn(
            "cos",
            F.round(_dot(F.col("va"), F.col("_v")) / (F.col("na") * F.col("_nrm")), 6),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny,
    broadcast as literals). Box-Muller over a hash-derived uniform."""
    import hashlib

    planes = []
    for p in range(n_planes):
        v = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            u1 = (int.from_bytes(h[:8], "big") + 1) / (2**64 + 2)
            u2 = int.from_bytes(h[8:16], "big") / 2**64
            v.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(v)
    return planes


def lsh_sketch(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH sketch: bucket = sum over planes of sign(v·plane)<<i.

    Runs one tiny job up front to learn the vector dimension (first row);
    an empty corpus (or a NULL leading vector) is rejected with a clear
    error rather than a TypeError deep in plan construction."""
    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("lsh_sketch: empty corpus (or NULL leading vector)")
    dim = len(head[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1 << i)).otherwise(0)
    return embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec"), bucket.alias("bucket")
    )


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: k-means centroids (Lloyd iterations, fully
    distributed) + the inverted-file assignment (id -> nearest centroid).

    Init is deterministic: the n_centroids vectors whose xxhash64(id) is
    smallest (a seeded pseudo-random sample with no RNG state); a corpus
    smaller than n_centroids clamps naturally to its size (empty input
    raises ValueError). Centroids live in a tiny DataFrame(cluster, cvec)
    and assignment is crossJoin(broadcast(centroids)) + min_by aggregation,
    so PLAN size is O(1) in both C and dim — real IVF shapes (C=4096,
    dim=768) never bake millions of literals into the plan. Per-round means
    are posexplode + groupBy(cluster, pos): two narrow shuffles per Lloyd
    round regardless of corpus size. Returns (centroids DataFrame(cluster
    int, cvec array<double>), assignments DataFrame(id, vec, cluster)).
    """
    from pyspark.sql import Window as W

    e = embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
    )
    centroids = (
        e.withColumn("_r", F.xxhash64(F.concat_ws(":", F.lit(seed), F.col("id"))))
        .orderBy("_r")
        .limit(n_centroids)
        # the unpartitioned window below sees <= n_centroids rows (the
        # limit's single TakeOrdered output) — WindowExec's "No Partition
        # Defined" warning is safe here, the relation is bounded by design
        .select(
            (F.row_number().over(W.orderBy("_r")) - 1).cast("int").alias("cluster"),
            F.col("vec").alias("cvec"),
        )
        .localCheckpoint()  # <= n_centroids rows; cut lineage, compute once
    )
    if centroids.isEmpty():
        raise ValueError("ivf_build: empty corpus — nothing to cluster")

    def assign(cent: DataFrame) -> DataFrame:
        # map-side nearest-centroid (see _assign_mapside): every row
        # scores the broadcast centroid array and takes the argmin
        # in-place — NO shuffle per Lloyd round (the previous
        # crossJoin+groupBy(id) shuffled the whole corpus every round;
        # ties still break to the lowest cluster id)
        return _assign_mapside(e, cent, probe_col="vec", dist_fn=_sqdist)

    for _ in range(iterations):
        assigned = assign(centroids)
        # per-dimension means without C x dim driver literals or columns:
        # explode to (cluster, pos, v), mean per (cluster, pos), re-assemble
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("cluster", F.transform("_pm", lambda s: s.m).alias("cvec"))
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.alias("o")
            .join(means.alias("n"), "cluster", "left")
            .select("cluster", F.coalesce("n.cvec", "o.cvec").alias("cvec"))
            .localCheckpoint()
        )
    return centroids, assign(centroids).select("id", "vec", "cluster")


# --- fixed-point IVF: an engine-exact k-means build -------------------------
#
# The float `ivf_build` above is the production shape, but its float means
# are sum-order-dependent, so no other engine can replay the build
# bit-for-bit (the driver could only rows-check it). The fixed-point twin
# makes every build step exact integer arithmetic — the same trick that made
# PageRank oracle-checkable (operators/graph.py):
#
#   quantize   q_i = floor(v_i * 1024 + 0.5)         (array<bigint>)
#   init       the C rows with smallest Knuth hash ((id % 1000003) *
#              2654435761 + 1013904223) % 2^32, ties on id — a seeded
#              pseudo-random spread with NO engine-specific hash (xxhash64
#              doesn't exist in DuckDB); the inner % keeps the product
#              < 2^52, overflow-safe under ANSI mode at any id
#   distance   integer squared L2 (exact)
#   new mean   floor(SUM(q_i) / COUNT) per dimension (integer sums are
#              exact in any order; floor division is engine-portable)
#
# so identical Lloyd iterations replay in DuckDB as chained CTEs and the
# whole ANN result — build, probes, candidates, ranks — value-hashes.
# Plan shape is identical to the float path (broadcast centroids, min_by
# assignment, posexplode means: O(1) plan in C and dim, two narrow shuffles
# per round).

FIXED_POINT_SCALE = 1024


def fixed_vec(v):
    """array<double> -> array<bigint>: floor(x*S + 0.5). floor(x+0.5), not
    round() — ROUND half-even/half-up differs across engines, floor(x+0.5)
    nowhere does (same rule as quantize_vectors)."""
    return F.transform(
        v,
        lambda x: F.floor(x * F.lit(float(FIXED_POINT_SCALE)) + F.lit(0.5)).cast(
            "bigint"
        ),
    )


def _isqdist(a, b):
    """Exact integer squared L2 over array<bigint>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _init_rank(id_col):
    """Engine-portable pseudo-random init order (Knuth multiplicative)."""
    return F.pmod(
        F.pmod(id_col, F.lit(1000003)) * F.lit(2654435761) + F.lit(1013904223),
        F.lit(4294967296),
    )


def _assign_mapside(
    e: DataFrame, cent: DataFrame, probe_col: str = "qvec", dist_fn=None
) -> DataFrame:
    """Nearest-centroid assignment with NO shuffle: the centroid table is
    folded into ONE array<struct(cluster,cvec)> row (sorted by cluster),
    broadcast, and each corpus row computes its distance vector and takes
    argmin = array_position(d, array_min(d)) — first minimum over the
    cluster-sorted array, i.e. ties break to the lowest cluster id,
    exactly the min_by(struct(d, cluster)) rule the oracle replays.
    explode(array(·)) is a Generate barrier so the C×dim distance
    transform is evaluated once per row even though argmin references it
    twice (the CollapseProject double-evaluation trap). Plan stays O(1)
    in C and dim — centroids are data, never literals.

    ``probe_col``/``dist_fn`` pick the distance: integer sqdist over qvec
    (fixed-point build, engine-exact) or float sqdist over vec."""
    dist_fn = dist_fn or _isqdist
    keep = [c for c in e.columns]
    cent_row = cent.agg(
        F.array_sort(F.collect_list(F.struct("cluster", "cvec"))).alias("_cents")
    )
    staged = e.crossJoin(F.broadcast(cent_row)).select(
        *keep,
        "_cents",
        F.explode(
            F.array(
                F.transform(
                    "_cents", lambda c: dist_fn(F.col(probe_col), c["cvec"])
                )
            )
        ).alias("_d"),
    )
    return staged.select(
        *keep,
        F.element_at(
            F.col("_cents"), F.array_position(F.col("_d"), F.array_min(F.col("_d"))).cast("int")
        )["cluster"].alias("cluster"),
    )


def ivf_build_fixed(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fixed-point IVF build (see block comment above). Returns
    (centroids DataFrame(cluster int, cvec array<bigint>), assignments
    DataFrame(id, vec array<double>, qvec array<bigint>, cluster)).

    Cost per Lloyd round: a map-side assignment (zero shuffle — see
    _assign_mapside) plus ONE groupBy(cluster) with dim sum aggregates
    (partial-agg pre-reduces map-side, so the shuffle carries C×dim
    longs per task, not the corpus). Plan is O(dim) and O(1) in C."""
    from pyspark.sql import Window as W

    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("ivf_build_fixed: empty corpus — nothing to cluster")
    # spread + materialize once: a small embeddings parquet is often ONE
    # input split (CLAUDE gotcha), which would serialize every per-row
    # distance pass; and each Lloyd round re-reads e, so compute the
    # quantization once instead of per-iteration
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    e = (
        embeddings.select(
            F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
        )
        .withColumn("qvec", fixed_vec(F.col("vec")))
        .repartition(par)
        .localCheckpoint(eager=False)
    )
    centroids = (
        e.withColumn("_r", _init_rank(F.col("id")))
        .orderBy("_r", "id")
        .limit(n_centroids)
        # unpartitioned window over <= n_centroids rows (bounded by the
        # limit) — the WindowExec single-partition warning is safe here
        .select(
            (F.row_number().over(W.orderBy("_r", "id")) - 1).cast("int").alias(
                "cluster"
            ),
            F.col("qvec").alias("cvec"),
        )
        .localCheckpoint()
    )

    for _ in range(iterations):
        assigned = _assign_mapside(e, centroids)
        # integer floor-division means: SUM is exact in any order,
        # floor(sum/count) is the same number in every engine (dim-wise
        # sums of |q| <= a few * SCALE per row stay < 2^53 even at 1e10
        # rows per cluster). posexplode + groupBy(cluster, pos) keeps the
        # plan O(1) in dim (a dim-wide aggregate list compiles a huge
        # codegen class per round — measured slower than the extra narrow
        # shuffle even at dim=64)
        means = (
            assigned.select("cluster", F.posexplode("qvec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.floor(F.sum("v") / F.count(F.lit(1))).cast("bigint").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("cluster", F.transform("_pm", lambda s: s.m).alias("cvec"))
        )
        centroids = (
            centroids.alias("o")
            .join(means.alias("n"), "cluster", "left")
            .select("cluster", F.coalesce("n.cvec", "o.cvec").alias("cvec"))
            .localCheckpoint()
        )
    return centroids, _assign_mapside(e, centroids)


def ivf_ann_topk_fixed(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over the fixed-point build: probes rank centroids by exact
    integer distance; candidates come from an equi-join on cluster id; the
    final score is cosine over the ORIGINAL double vectors (rounded 6 dp,
    the same sequential-sum form DuckDB's list_cosine_similarity computes),
    so the whole result value-hashes against a SQL oracle. Same plan shape
    and output schema as ivf_ann_topk."""
    centroids, ivf = ivf_build_fixed(
        embeddings, n_centroids, iterations, id_col, vec_col
    )
    ivf = ivf.localCheckpoint(eager=False)
    q = ivf.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv"), F.col("qvec").alias("qq")
    )
    wp = Window.partitionBy("query_id").orderBy("_d", "cluster")
    probe = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_d", _isqdist(F.col("qq"), F.col("cvec")))
        .withColumn("_rk", F.row_number().over(wp))
        .where(F.col("_rk") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    cand = ivf.join(F.broadcast(probe), ["cluster"]).where(
        F.col("id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("qv"), F.col("vec")), 6))
    return topk_per_query(scored, [F.desc("cos"), F.col("id")], k).select(
        "query_id", F.col("id").alias("neighbor_id"), "cos", "rank"
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public technique):
    k-means-cluster the embedding corpus, then score candidate near-dup
    pairs ONLY within a cluster — the semantic analog of banded LSH, and
    the standard way web-scale pipelines prune 'same meaning, different
    bytes' documents that n-gram dedup can't see.

    Scale shape: ONE shuffle on cluster id; candidate volume is
    sum(|cluster|^2) ≈ n^2/C instead of n^2 — at web scale C grows with
    the corpus (SemDeDup uses ~50k clusters for 5e9 docs) so per-cluster
    work stays bounded; a pathological mega-cluster can be capped with
    operators/dedup.cap_hot_bands on the assignment before the self-join.
    Built on ivf_build_fixed, so the clustering (and therefore the exact
    pair set) is engine-exact and the whole operator value-hashes against
    a SQL oracle. Output: (id_a, id_b, cos) with id_a < id_b, cos >=
    threshold (cosine over the original doubles, rounded 6 dp)."""
    _, ivf = ivf_build_fixed(embeddings, n_centroids, iterations, id_col, vec_col)
    # the assignment feeds both sides of the self-join — materialize once,
    # WITH the per-vector norm (computed once per row here, not twice per
    # candidate pair; same doubles and division order as cosine(), so the
    # result stays hash-identical to the oracle)
    ivf = (
        ivf.select("id", "vec", "cluster")
        .withColumn("_nrm", _norm(F.col("vec")))
        .localCheckpoint(eager=False)
    )
    return (
        ivf.alias("a")
        .join(
            ivf.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a._nrm") * F.col("b._nrm")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup: flag arriving vectors that are semantic
    near-dups of the persisted corpus — the CDC-ingest shape of
    semantic_dedup_pairs. The corpus's fixed-point clustering (in deploy:
    precomputed once by ivf_write and stored partitioned by cluster) is
    the index; each batch vector is assigned to its nearest centroid via
    crossJoin(broadcast(centroids)) and compared ONLY against same-cluster
    corpus vectors, with the (small) batch side broadcast into the
    candidate join — the corpus is scanned, never shuffled (plan-tested),
    exactly like incremental_lsh_dups for lexical near-dups.

    Output: (new_id, dup_of, cos) with cos >= threshold."""
    centroids, ivf = ivf_build_fixed(corpus, n_centroids, iterations, id_col, vec_col)
    b = batch.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
    ).withColumn("qvec", fixed_vec(F.col("vec")))
    assigned_b = _assign_mapside(b, centroids).select(
        F.col("id").alias("new_id"),
        F.col("vec").alias("nvec"),
        "cluster",
    )
    # per-vector norms once per row (not per candidate pair); the corpus
    # side folds its norm into the scan projection, the (small) batch side
    # carries its norm through the broadcast
    assigned_b = assigned_b.withColumn("_bn", _norm(F.col("nvec")))
    return (
        ivf.withColumn("_cn", _norm(F.col("vec")))
        .join(F.broadcast(assigned_b), "cluster")
        .select(
            "new_id",
            F.col("id").alias("dup_of"),
            F.round(
                _dot(F.col("nvec"), F.col("vec")) / (F.col("_bn") * F.col("_cn")), 6
            ).alias("cos"),
        )
        # a re-ingested id must not be flagged as a duplicate of its own
        # prior version (same guard incremental_lsh_dups applies)
        .where((F.col("cos") >= threshold) & (F.col("dup_of") != F.col("new_id")))
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: exact cosine only against vectors whose
    cluster is one of the query's ``n_probe`` nearest centroids.

    The 100 TB shape: the corpus is scanned once to build the inverted
    file; a query touches n_probe/n_centroids of the corpus via an
    equi-join on cluster id (partition-prunable when the IVF table is
    written partitioned by cluster). Recall < 1 by design; n_probe trades
    recall for cost. Output: (query_id, neighbor_id, cos, rank).
    """
    centroids, ivf = ivf_build(
        embeddings, n_centroids, iterations, seed, id_col, vec_col
    )
    # the inverted file feeds two branches (query extraction + candidate
    # join) — materialize once
    ivf = ivf.localCheckpoint(eager=False)
    q = ivf.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv")
    )
    # n_probe nearest centroids per query — tiny broadcast cross join
    # (|Q| x C rows), never a driver collect; ties break on cluster id
    wp = Window.partitionBy("query_id").orderBy("_d", "cluster")
    probe = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_d", _sqdist(F.col("qv"), F.col("cvec")))
        .withColumn("_rk", F.row_number().over(wp))
        .where(F.col("_rk") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    cand = ivf.join(F.broadcast(probe), ["cluster"]).where(
        F.col("id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("qv"), F.col("vec")), 6))
    return topk_per_query(scored, [F.desc("cos"), F.col("id")], k).select(
        "query_id", F.col("id").alias("neighbor_id"), "cos", "rank"
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe buckets;
    exact cosine only on candidates. Recall < 1 by design — the scale path
    where brute force is too big; bucket-join instead of cross-join.

    Multi-probe: a near neighbor on the wrong side of r hyperplanes lands
    in a bucket at Hamming distance r, so each query also probes every
    bucket within ``probe_radius`` bit flips (sum_{i<=r} C(n_planes, i)
    buckets — the standard single-digit-recall fix for sign LSH; the probe
    fan-out multiplies only the tiny broadcast QUERY side, the corpus is
    still sketched and shuffled once).
    """
    from itertools import combinations

    sk = lsh_sketch(embeddings, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col)
    q = sk.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv"), "bucket"
    )
    masks = [0] + [
        sum(1 << b for b in bits)
        for r in range(1, probe_radius + 1)
        for bits in combinations(range(n_planes), r)
    ]
    probes = q.select(
        "query_id",
        "qv",
        "bucket",
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("_mask"),
    ).select(
        "query_id",
        "qv",
        F.expr("bucket ^ _mask").alias("bucket"),
    )
    # distinct masks => distinct probe buckets, and every corpus vector has
    # exactly one bucket, so each (query, corpus) pair joins at most once
    cand = sk.join(F.broadcast(probes), ["bucket"]).where(
        F.col("id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("qv"), F.col("vec")), 6))
    return topk_per_query(scored, [F.desc("cos"), F.col("id")], k).select(
        "query_id", F.col("id").alias("neighbor_id"), "cos", "rank"
    )


def ivf_write(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    iterations: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the inverted file ON DISK partitioned by cluster (plus
    the centroid table) — the deploy shape of IVF at corpus scale: a probe
    of n_probe/n_centroids clusters becomes PARTITION PRUNING on the scan
    (verified by plan test), so a query reads that fraction of the corpus
    from storage instead of filtering it after a full scan."""
    centroids, assigned = ivf_build(
        embeddings, n_centroids, iterations, seed, id_col, vec_col
    )
    assigned.write.partitionBy("cluster").mode("overwrite").parquet(f"{path}/ivf")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_query_partitioned(
    spark,
    path: str,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k over a written IVF table: nearest n_probe centroids per query
    (driver-side over the tiny centroid table), then a scan of ONLY those
    cluster partitions (PartitionFilters prune at the source) + exact
    cosine on candidates. The only driver-side data are the centroids
    (C x dim — the quantizer, small by construction) and the query set."""
    cents = {
        r.cluster: list(r.cvec)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }

    def nearest(qv):
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, c)), ci) for ci, c in cents.items()
        )
        return [ci for _, ci in ds[:n_probe]]

    probe_rows = [
        (qid, [float(x) for x in qv], ci)
        for qid, qv in query_vecs
        for ci in nearest(qv)
    ]
    probe = spark.createDataFrame(
        probe_rows, schema="query_id long, qv array<double>, cluster int"
    )
    clusters = sorted({ci for _, _, ci in probe_rows})
    ivf = spark.read.parquet(f"{path}/ivf").where(F.col("cluster").isin(clusters))
    cand = ivf.join(F.broadcast(probe), ["cluster"]).where(
        F.col("id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("qv"), F.col("vec")), 6))
    return topk_per_query(scored, [F.desc("cos"), F.col("id")], k).select(
        "query_id", F.col("id").alias("neighbor_id"), "cos", "rank"
    )


def quantize_vectors(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector — the storage form of a
    corpus-scale embedding table (4x smaller than float32, 8x smaller than
    float64; dot products stay within ~1% for unit-norm vectors).

    scale = max|v| / 127; q_i = clamp(floor(v_i/scale + 0.5), -127, 127).
    floor(x+0.5) (not round()) keeps the rule engine-portable — ROUND
    half-even/half-up differs across engines, floor(x+0.5) nowhere does.
    All JVM array expressions (transform/aggregate) — no Python, no
    shuffle: a pure map over the corpus, whole-stage codegen.

    Output: (id, scale, qvec array<int>). Dequantization is q * scale.
    """
    v = as_double(F.col(vec_col))
    # CollapseProject inlines a projected expression into every reference
    # site — if `scale` (an O(dim) array_max) stayed a plain projection, the
    # per-element lambda below would re-evaluate it dim times (O(dim^2)/row;
    # measured 7x on the bench). explode(array(e)) is a Generate barrier:
    # 1 row in, 1 row out, but the generated column is an attribute the
    # optimizer cannot inline, so scale is computed exactly once per row.
    staged = embeddings.select(F.col(id_col).alias("id"), v.alias("_v")).select(
        "id",
        "_v",
        F.explode(
            F.array(F.array_max(F.transform(F.col("_v"), F.abs)) / F.lit(127.0))
        ).alias("_scale"),
    )
    # all-zero vector: scale 0 -> emit zeros (guard the division)
    safe = F.when(F.col("_scale") == 0.0, F.lit(1.0)).otherwise(F.col("_scale"))
    q = F.transform(
        F.col("_v"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x / safe + F.lit(0.5)).cast("int")),
        ),
    )
    # second barrier: qvec as an attribute, so a consumer referencing it k
    # times (sum/min/max/size) pays the transform once, not k times.
    return (
        staged.select("id", F.round(F.col("_scale"), 9).alias("scale"), q.alias("_q"))
        .select("id", "scale", F.explode(F.array(F.col("_q"))).alias("qvec"))
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid: "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011). The memory-bound ANN path: a
# 64-dim float vector (256 B) compresses to m one-byte codes (m=4 here ->
# 16x), and query scanning needs only the codes plus a per-query m x k
# lookup table — the shape that lets a 1e10-vector corpus fit a cluster's
# RAM. Built on the SAME engine-exact fixed-point arithmetic as
# ivf_build_fixed (integer quantize, Knuth-hash init, exact integer
# distances, floor-division means), so the whole build AND the ADC
# (asymmetric distance computation) scan are integer-exact and the result
# value-hashes against a DuckDB replay.
#
# Spark shape (the 100 TB plan):
#  - ONE Lloyd loop trains all m sub-codebooks jointly: subspace id is
#    DATA (explode to (id, sub, subvec) rows), assignment is map-side
#    (codebooks fold to m rows, broadcast), means are one narrow
#    groupBy(sub, code, pos) partial agg per round — never m sequential
#    jobs, never a corpus shuffle;
#  - encoding is the final map-side assignment + one groupBy(id) to
#    collapse the m codes into an array<int>;
#  - the ADC scan broadcasts per-query LUTs (m x k integers per query) and
#    computes each row's distance with zip_with/aggregate over its code
#    array — map-only over the codes relation, then one top-k window.
# ---------------------------------------------------------------------------


def _assign_codes_mapside(es: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-sub-centroid assignment with no corpus shuffle: ``cents``
    (sub, code, cv) folds to one array row PER SUB (sorted by code),
    broadcast-joined on sub; argmin = array_position(array_min) — ties to
    the lowest code, the row_number()-over-(d, code) rule the oracle
    replays. explode(array(.)) is the Generate barrier against the
    CollapseProject double-evaluation trap (see _assign_mapside)."""
    keep = list(es.columns)
    folded = cents.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("code", "cv"))).alias("_cents")
    )
    staged = es.join(F.broadcast(folded), "sub").select(
        *keep,
        "_cents",
        F.explode(
            F.array(
                F.transform("_cents", lambda c: _isqdist(F.col("sv"), c["cv"]))
            )
        ).alias("_d"),
    )
    return staged.select(
        *keep,
        F.element_at(
            F.col("_cents"),
            F.array_position(F.col("_d"), F.array_min(F.col("_d"))).cast("int"),
        )["code"].alias("code"),
    )


def pq_build_fixed(
    embeddings: DataFrame,
    m_subspaces: int = 4,
    n_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, int]:
    """Train the m sub-codebooks and encode the corpus. Returns
    (codebooks DF(sub int, code int, cv array<bigint>),
     codes DF(id, codes array<int> length m), d_sub).

    Requires dim % m_subspaces == 0. Every arithmetic step is exact
    integer (see module block comment), so identical codebooks and codes
    come out of any engine."""
    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("pq_build_fixed: empty corpus — nothing to train")
    dim = len(head[0])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    ds = dim // m_subspaces

    par = embeddings.sparkSession.sparkContext.defaultParallelism
    e = (
        embeddings.select(
            F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
        )
        .withColumn("qvec", fixed_vec(F.col("vec")))
        .repartition(par)
        .localCheckpoint(eager=False)
    )
    # subspace rows: (id, sub 1..m, sv = that sub's ds-wide integer slice)
    es = e.select(
        "id",
        F.explode(F.expr(f"sequence(1, {m_subspaces})")).alias("sub"),
        "qvec",
    ).select(
        "id",
        "sub",
        F.expr(f"slice(qvec, (sub - 1) * {ds} + 1, {ds})").alias("sv"),
    ).localCheckpoint(eager=False)

    # init: the n_codes lowest-rank ids seed EVERY sub's codebook (rank is
    # a pure function of id, so per-sub selection would pick the same ids)
    from pyspark.sql import Window as W

    seeds = (
        e.withColumn("_r", _init_rank(F.col("id")))
        .orderBy("_r", "id")
        .limit(n_codes)
        # unpartitioned window over <= n_codes rows (bounded by the
        # limit) — the WindowExec single-partition warning is safe here
        .select(
            (F.row_number().over(W.orderBy("_r", "id")) - 1).cast("int").alias(
                "code"
            ),
            "qvec",
        )
    )
    cents = seeds.select(
        "code",
        "qvec",
        F.explode(F.expr(f"sequence(1, {m_subspaces})")).alias("sub"),
    ).select(
        F.col("sub").cast("int").alias("sub"),
        "code",
        F.expr(f"slice(qvec, (sub - 1) * {ds} + 1, {ds})").alias("cv"),
    ).localCheckpoint()

    for _ in range(iterations):
        assigned = _assign_codes_mapside(es, cents)
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub", "code", "pos")
            .agg(F.floor(F.sum("v") / F.count(F.lit(1))).cast("bigint").alias("m"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("sub", "code", F.transform("_pm", lambda s: s.m).alias("cv"))
        )
        cents = (
            cents.alias("o")
            .join(means.alias("n"), ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("n.cv", "o.cv").alias("cv"))
            .localCheckpoint()
        )

    codes = (
        _assign_codes_mapside(es, cents)
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("_sc"))
        .select("id", F.transform("_sc", lambda s: s.code).alias("codes"))
    )
    return cents, codes, ds


def pq_ann_topk_fixed(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m_subspaces: int = 4,
    n_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC top-k: per query, a broadcast m x n_codes integer LUT of
    exact sub-distances to every codebook entry; each corpus row's
    approximate distance is the sum of its m table lookups (zip_with +
    aggregate, map-only over the codes relation); one window ranks.
    Returns (query_id, neighbor_id, adist bigint, rank) — all integers,
    value-hashable with no float anywhere."""
    cents, codes, ds = pq_build_fixed(
        embeddings, m_subspaces, n_codes, iterations, id_col, vec_col
    )
    codes = codes.localCheckpoint(eager=False)
    folded = cents.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("code", "cv"))).alias("_cents")
    )
    # per-query LUT rows: (query_id, sub, lut array<bigint> ordered by code)
    qs = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), fixed_vec(as_double(F.col(vec_col))).alias("qq"))
        .select(
            "query_id",
            F.explode(F.expr(f"sequence(1, {m_subspaces})")).alias("sub"),
            "qq",
        )
        .select(
            "query_id",
            "sub",
            F.expr(f"slice(qq, (sub - 1) * {ds} + 1, {ds})").alias("sv"),
        )
    )
    luts = (
        qs.join(F.broadcast(folded), "sub")
        .select(
            "query_id",
            "sub",
            F.transform("_cents", lambda c: _isqdist(F.col("sv"), c["cv"])).alias(
                "lut"
            ),
        )
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "lut"))).alias("_sl"))
        .select("query_id", F.transform("_sl", lambda s: s.lut).alias("luts"))
    )
    adist = F.aggregate(
        F.zip_with(
            "luts", "codes", lambda l, c: F.element_at(l, (c + F.lit(1)).cast("int"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), adist.alias("adist"))
    )
    return topk_per_query(
        scored, [F.col("adist"), F.col("neighbor_id")], k
    ).select("query_id", "neighbor_id", "adist", "rank")


def pq_ann_topk_refined(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    shortlist: int = 20,
    m_subspaces: int = 4,
    n_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production PQ serving shape: the ADC scan produces a ``shortlist``
    of candidates per query from the compressed codes alone (the cheap,
    memory-resident pass over 1e10 codes), then ONLY those rows' original
    vectors are fetched for an exact cosine re-rank to top-k — the
    two-stage retrieve-then-refine pattern (Jégou et al. §V). The
    candidate set is integer-exact (so the oracle replays it), the final
    cosine is the same rounded-6dp sequential sum every other sim query
    hashes. Returns (query_id, neighbor_id, cos, rank)."""
    adc = pq_ann_topk_fixed(
        embeddings, query_ids, k=shortlist,
        m_subspaces=m_subspaces, n_codes=n_codes, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("_v")
    )
    qv = vecs.where(F.col("_vid").isin(query_ids)).select(
        F.col("_vid").alias("query_id"), F.col("_v").alias("_qv")
    )
    # candidate relation is |queries| x shortlist rows — broadcast it onto
    # the corpus vectors (the "fetch" is an equi-join, never a re-scan)
    cand = (
        vecs.join(F.broadcast(adc), vecs["_vid"] == adc["neighbor_id"])
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cos"),
        )
    )
    # cand is already bounded (k_coarse ADC survivors per query), but the
    # same two-phase rank keeps one code shape across every serving path
    return topk_per_query(
        cand, [F.desc("cos"), F.col("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cos", "rank")
