"""Mergeable cardinality sketches (HyperLogLog) as pure DataFrame programs.

The 100 TB problem: COUNT(DISTINCT key) forces a full shuffle of every
distinct key. An HLL sketch replaces it with a bounded-size register table
(m = 2^p rows per group) that partial-aggregates map-side — the shuffle
carries at most m rows per (partition, group) no matter how many keys flow
through — and registers MERGE with a plain max, so per-partition /
per-source / per-day sketches roll up without touching raw data again
(the property Spark's own approx_count_distinct uses internally).

Why not approx_count_distinct: its HLL++ registers are engine-internal, so
nothing outside Spark can verify it. These registers are md5-derived
(Flajolet et al. 2007, public algorithm):

    h32      = first 8 hex chars of md5(key) as a 32-bit unsigned int
    register = top p bits of h32
    rho      = 1 + leading zeros of the remaining (32-p)-bit word
             = width - floor(log2 w)  computed as width - length(bin(w)) + 1
               (w = 0 -> width + 1)

which any engine reproduces bit-for-bit — the DuckDB oracles re-derive the
registers AND the estimate and match exactly. The estimator's harmonic sum
uses exact integers (sum of 2^(K - rho) at K=40, < 2^48 for p <= 12), so
no float-accumulation-order nondeterminism exists anywhere: the only float
ops are one division (raw estimate) and one ln (linear-counting small-range
correction), identical expressions on both sides.

Reference parity note: the reference engine has no sketches (its keys are
unique by construction); this is net-new training-data-pipeline capability
(corpus census: distinct urls/domains/tokens at crawl scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact-integer scale for the harmonic sum: 2^(K - rho) with rho <= 33
_K = 40


def _alpha_mm_2k(p: int) -> float:
    """alpha_m * m^2 * 2^K as one Python double, embedded as a literal in
    BOTH the Spark plan and the SQL oracle so the raw estimate is a single
    identical division on each side."""
    m = 1 << p
    if p < 7:
        raise ValueError("p < 7 not supported (alpha constants differ)")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(2**_K)


def hll_add(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """One pass over the data -> HLL register table:
    (group_cols..., register int, max_rho int), <= 2^p rows per group.

    groupBy partial-aggregates the max map-side, so the shuffle after the
    scan is bounded by m rows per input partition per group — the sketch
    property that makes distinct-counting flat at corpus scale.
    """
    width = 32 - p
    h32 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    # NULL keys carry no cardinality (COUNT DISTINCT ignores them) — drop
    # them before hashing or they'd mint a NULL register row
    df = df.where(F.col(key_col).isNotNull())
    staged = df.select(
        *group_cols,
        F.shiftright(h32, width).cast("int").alias("register"),
        h32.bitwiseAND(F.lit((1 << width) - 1)).alias("_w"),
    )
    # length(bin(w)) = floor(log2 w) + 1 for w > 0; bin(0) = '0' (length 1,
    # NOT zero) so the w = 0 case is explicit: all width bits zero -> width+1
    rho = F.when(F.col("_w") == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(F.col("_w"))) + 1
    )
    return (
        staged.withColumn("_rho", rho.cast("int"))
        .groupBy(*group_cols, "register")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_merge(registers: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables (e.g. per-source or per-day sketches) into the
    sketch of the UNION of their inputs: plain max per register — the
    rollup never rereads raw data."""
    return registers.groupBy(*group_cols, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Registers -> (group_cols..., hll_distinct double rounded 2dp).

    Standard HLL estimator with the linear-counting small-range correction:
      S       = sum over ALL m registers of 2^(K - rho)   (empty rho = 0)
      E_raw   = alpha_m * m^2 * 2^K / S
      E       = m * ln(m / V)  when E_raw <= 2.5 m and V (empty count) > 0
    S is an exact BIGINT (the 2^(K-rho) terms are integers, commutative),
    so the estimate is deterministic under any aggregation order.
    """
    m = 1 << p
    lit_amm = F.lit(_alpha_mm_2k(p))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_K} - max_rho)")).alias("_s_present"),
        F.count("*").alias("_n_present"),
    )
    v = F.lit(m) - F.col("_n_present")
    s = F.col("_s_present") + v * F.lit(1 << _K).cast("long")
    e_raw = lit_amm / s.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 2).alias("hll_distinct"))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Convenience: add + estimate in one call."""
    return hll_estimate(hll_add(df, key_col, group_cols, p), group_cols, p)


def cms_hash(key_col: str, i: int, w: int):
    """Row-i count-min hash of a key: md5-derived 32-bit word mod width —
    engine-portable (the oracle re-derives it) and pairwise-independent
    enough in practice (distinct salted md5 per row)."""
    h32 = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h32 % w).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of key frequencies:
    (group_cols..., row, col, cnt) with d*w counters per group.

    The 100 TB shape: the posexplode multiplies rows d-fold MAP-SIDE only —
    the groupBy partial-aggregates, so the shuffle carries at most d*w
    counter rows per (input partition, group) regardless of key volume,
    and sketches for different days/sources MERGE by summing counters
    (cms_merge). Estimates only ever over-count (collisions add), never
    under — min over the d rows bounds the error at ~2N/w with prob 1-2^-d.
    """
    staged = df.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.posexplode(F.array(*[cms_hash(key_col, i, w) for i in range(d)])).alias(
            "row", "col"
        ),
    )
    return staged.groupBy(*group_cols, "row", "col").agg(
        F.count("*").alias("cnt")
    )


def cms_merge(sketch: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge count-min sketches (same d, w): counters add."""
    return sketch.groupBy(*group_cols, "row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Estimate the frequency of each key in ``keys``: min over the d rows
    of its counter cells. The SKETCH side is broadcast — it is bounded at
    d*w rows BY CONSTRUCTION (that's the point of the sketch), so the
    probe side can be arbitrarily large (score every key in a corpus)
    without shuffling either relation. A missing cell means the key never
    hashed there (0)."""
    # NULL probe keys (common after an outer join) would hash as the bare
    # salt string — concat_ws skips NULLs — and return whatever real keys
    # collided with those cells; the build side drops NULLs, so estimates
    # must too
    probes = keys.where(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.posexplode(F.array(*[cms_hash(key_col, i, w) for i in range(d)])).alias(
            "row", "col"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


def hll_oracle_sql(
    source_sql: str,
    key_expr: str,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> str:
    """The DuckDB re-statement of hll_distinct over ``source_sql`` (a
    relation exposing ``key_expr`` and the group columns) — byte-identical
    register derivation and the same literal estimator constants, so the
    oracle matches the Spark value exactly, not approximately."""
    m = 1 << p
    width = 32 - p
    amm = repr(_alpha_mm_2k(p))
    gsel = ", ".join(group_cols)
    gpre = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    return f"""
    WITH src AS ({source_sql}),
    h AS (SELECT {gpre}
                 CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
          FROM src WHERE {key_expr} IS NOT NULL),
    rr AS (SELECT {gpre} h32 // {1 << width} AS register,
                  h32 % {1 << width} AS w
           FROM h),
    regs AS (SELECT {gpre} register,
                    MAX(CASE WHEN w = 0 THEN {width + 1}
                             ELSE {width} - length(bin(w)) + 1 END) AS max_rho
             FROM rr GROUP BY {gpre} register),
    agg AS (SELECT {gpre}
                   CAST(SUM(CAST(2 AS BIGINT) ** ({_K} - max_rho)) AS BIGINT) AS s_present,
                   COUNT(*) AS n_present
            FROM regs {gby}),
    est AS (SELECT {gpre}
                   ({m} - n_present) AS v,
                   {amm} / CAST(s_present + ({m} - n_present) * {1 << _K} AS DOUBLE)
                     AS e_raw
            FROM agg)
    SELECT {gpre}
           ROUND(CASE WHEN e_raw <= {2.5 * m} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
                      ELSE e_raw END, 2) AS hll_distinct
    FROM est
    """


# ---------------------------------------------------------------------------
# bottom-k sketch: deterministic mergeable uniform sample (Cohen & Kaplan,
# "Summarizing data using bottom-k sketches", PODC 2007)
# ---------------------------------------------------------------------------
#
# The k rows whose md5(id) is smallest form a uniform-without-replacement
# sample of the group (the hash is a fixed random permutation of ids), and
# the union rule "keep the k smallest of both" makes sketches mergeable:
# per-partition / per-day sketches roll up EXACTLY to the whole-data sketch
# — so, unlike a reservoir sample, the result is order- and
# partitioning-independent, which is also what makes it oracle-checkable
# bit-for-bit. Quantile estimates read the sample; error is the standard
# sampling bound (~1/sqrt(k) quantile deviation), deterministic given ids.


def bottomk_sketch(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """(group..., sketch: array<struct<h,v>>) — the k rows with the smallest
    md5(id) per group, hash-ordered. One shuffle on the group key; the
    window's sort-based top-k spills instead of materializing the group in
    memory (why this is not a collect_list)."""
    from pyspark.sql import Window

    if not group_cols:
        # Window.partitionBy() with no keys would move the WHOLE input into
        # one partition for the sort. Mergeability is the fix: bottom-k per
        # input partition in parallel, then merge the tiny partials — the
        # union rule makes the result EXACTLY the global sketch.
        partials = bottomk_sketch(
            df.withColumn("_pid", F.spark_partition_id()),
            id_col,
            value_col,
            ("_pid",),
            k,
        )
        return bottomk_merge(partials, k)

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    ranked = (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    return ranked.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("_h").alias("h"), F.col(value_col).alias("v"))
            )
        ).alias("sketch")
    )


def bottomk_merge(
    sketches: DataFrame, k: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Roll partial sketches up: keep the k hash-smallest across all —
    merged(partials) == sketch(whole data), exactly (tested)."""
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("sketch"))), 1, k
        ).alias("sketch")
    )


def bottomk_quantiles(sketches: DataFrame, qs: tuple[float, ...]) -> DataFrame:
    """Append est_p<q> columns: the sample's q-quantile by lower index
    (element floor(q*(n-1)), 0-based, of the value-sorted sample — no
    interpolation, so any engine agrees bit-for-bit)."""
    vals = F.array_sort(F.transform(F.col("sketch"), lambda x: x["v"]))
    n = F.size(vals)
    out = sketches.withColumn("n_sample", n.cast("long"))
    for q in qs:
        idx0 = F.floor(F.lit(q) * (n - F.lit(1)).cast("double")).cast("int")
        out = out.withColumn(
            f"est_p{int(q * 100)}", F.get(vals, idx0)
        )
    return out


def bottomk_oracle_sql(
    table: str,
    id_col: str,
    value_col: str,
    group_col: str,
    k: int,
    qs: tuple[float, ...],
) -> str:
    """DuckDB twin of bottomk_sketch + bottomk_quantiles (1-based list
    indexing vs Spark's 0-based F.get is the only dialect delta)."""
    est_cols = ", ".join(
        f"samp[CAST(floor({q} * (n_sample - 1)) AS INT) + 1] AS est_p{int(q * 100)}"
        for q in qs
    )
    return f"""
    WITH ranked AS (
      SELECT {group_col}, {value_col},
             row_number() OVER (
               PARTITION BY {group_col}
               ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn
      FROM {table}),
    sk AS (
      SELECT {group_col},
             list_sort(list({value_col})) AS samp,
             CAST(COUNT(*) AS BIGINT) AS n_sample
      FROM ranked WHERE rn <= {k} GROUP BY {group_col})
    SELECT {group_col}, n_sample, {est_cols} FROM sk
    """


def kmv_set_sketch(df: DataFrame, id_col: str, k: int = 256) -> DataFrame:
    """One-row bottom-k SET sketch (KMV: k minimum md5 values over the
    DISTINCT ids — Beyer et al. 2007). The distinct() is load-bearing:
    duplicates share a hash, and without it a heavy hitter would occupy
    multiple sketch slots and bias every estimate. Output: (sketch:
    array<struct<h,v>>) — the bottomk_sketch format, so bottomk_merge
    unions KMV sketches too. NULL ids are dropped (md5(NULL) = NULL
    sorts FIRST, so a NULL would claim a guaranteed slot in every sketch
    and null-safe array_intersect would count it as overlap — the same
    reason hll_add filters NULL keys)."""
    return bottomk_sketch(
        df.select(id_col).where(F.col(id_col).isNotNull()).distinct(),
        id_col,
        id_col,
        (),
        k,
    )


def kmv_jaccard(a: DataFrame, b: DataFrame, id_col: str, k: int = 256) -> DataFrame:
    """Set resemblance from two KMV sketches: J(A,B) estimated as

        |K_k(A ∪ B) ∩ K(A) ∩ K(B)| / |K_k(A ∪ B)|

    (the standard KMV estimator: of the k hash-smallest union members,
    the fraction present in BOTH sketches). Exact when |A ∪ B| <= k —
    the sketch IS the set — and deterministic always (md5 order), so an
    engine twin reproduces it bit-for-bit.

    Scale shape: each side pays one distinct + the mergeable bottom-k
    (per-partition partials, no global window); everything after runs on
    three k-row arrays in a single task. This is the cheap corpus-vs-
    corpus overlap probe (did shard X leak into shard Y; how much does a
    new crawl overlap the last one) that exact Jaccard — a full
    distinct-join over both corpora — does at 10^10-row cost.

    Output one row: (k_union, n_both, jaccard_est)."""
    ka = kmv_set_sketch(a, id_col, k).select(F.col("sketch").alias("ska"))
    kb = kmv_set_sketch(b, id_col, k).select(F.col("sketch").alias("skb"))
    both = ka.crossJoin(kb)  # 1x1
    union_k = F.slice(
        F.array_sort(
            F.array_union(  # same-id rows carry identical (h,v) structs
                F.col("ska"), F.col("skb")
            )
        ),
        1,
        k,
    )
    ah = F.transform(F.col("ska"), lambda s: s["h"])
    bh = F.transform(F.col("skb"), lambda s: s["h"])
    uh = F.transform(union_k, lambda s: s["h"])
    inter = F.size(F.array_intersect(F.array_intersect(uh, ah), bh))
    return both.select(
        F.size(uh).cast("int").alias("k_union"),
        inter.cast("int").alias("n_both"),
        # guard the empty-input probe: size(union)=0 would DIVIDE_BY_ZERO
        # under default-ANSI Spark 4; two empty sets have J = 0
        F.when(F.size(uh) == 0, F.lit(0.0))
        .otherwise(inter.cast("double") / F.size(uh))
        .alias("jaccard_est"),
    )
