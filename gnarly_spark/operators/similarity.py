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
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


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
        .select(
            (F.row_number().over(W.orderBy("_r")) - 1).cast("int").alias("cluster"),
            F.col("vec").alias("cvec"),
        )
        .localCheckpoint()  # <= n_centroids rows; cut lineage, compute once
    )
    if centroids.isEmpty():
        raise ValueError("ivf_build: empty corpus — nothing to cluster")

    def assign(cent: DataFrame) -> DataFrame:
        # one broadcast nested-loop pass: every row scores C centroids,
        # min_by keeps the nearest (ties -> lowest cluster id, so the
        # result is deterministic); partial aggregation pre-reduces before
        # the (single) shuffle on id
        scored = e.crossJoin(F.broadcast(cent)).withColumn(
            "_d", _sqdist(F.col("vec"), F.col("cvec"))
        )
        return (
            scored.groupBy("id")
            .agg(
                F.min_by(
                    F.struct("cluster", "vec"), F.struct(F.col("_d"), F.col("cluster"))
                ).alias("_w")
            )
            .select("id", F.col("_w.vec").alias("vec"), F.col("_w.cluster").alias("cluster"))
        )

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
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos", "rank")
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
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos", "rank")
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
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos", "rank")
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
