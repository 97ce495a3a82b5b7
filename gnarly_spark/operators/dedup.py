"""Deduplication operators for training-data pipelines.

Not present in the reference (gnarly never dedups — its keys are unique by
construction); these are the net-new large-scale ingest operators the
engine needs at 100 TB: exact hash dedup, n-gram Jaccard, MinHash+LSH, and
SimHash. All are pure DataFrame programs (JVM-side hashing via md5/xxhash64,
no Python in the hot path).

Scale notes:
- exact dedup is a single hash-shuffle groupBy on a 32-byte digest — the
  cheapest possible full-corpus pass; AQE coalesces the post-agg partitions.
- the naive all-pairs Jaccard join explodes quadratically on common
  shingles; MinHash+LSH is the scale path: signatures are k min-hashes
  (k shuffle-free column ops after one explode+groupBy), LSH banding turns
  near-dup search into an equi-join on (band, band_hash) — exactly the
  shape Catalyst shuffles well. A frequency cap on shingles (stopword
  shingles) bounds the worst-case bucket.
- md5 (not python hash) keeps hashes identical across engines => the
  DuckDB oracles can re-derive signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col):
    """lower + collapse whitespace — shared by fingerprint/dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct normalized text.

    Output: (fingerprint, keep_id, n_copies).
    """
    return (
        docs.select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), id_col)
        # NULL-text docs must not collapse into one NULL-fingerprint group
        # (groupBy treats NULLs as equal): a page missing text is not an
        # exact copy of every other such page — exclude them, like the
        # sketch builders do with NULL keys
        .where(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition a (possibly single-file) doc table across the cluster
    before CPU-heavy per-doc expressions — a small dimension-table parquet
    arrives as one input split, which would serialize the whole shingle /
    token computation onto one task."""
    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    The word array is materialized in its own projection so the
    normalize-regex + split run once per doc — inlining them into the
    higher-order transform would re-evaluate them per element_at
    (measured 5x slower)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    base = _spread(base)
    w = F.col("_w")
    # docs shorter than n words yield NO shingles (matching the SQL
    # oracles): sequence(0, size-n) is only evaluated when size >= n —
    # sequence(0, -1) is NOT empty (it steps DOWN to [0, -1]), so the
    # tempting greatest(size-n, -1) bound crashes element_at on every
    # short or null-text doc. The when() also maps null text to no rows
    # (size(null) is null -> otherwise-branch empty array).
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)])
    )
    return base.select("id", F.explode(sh).alias("shingle")).distinct()


def cap_hot_shingles(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_doc_freq``.

    A stop-shingle ("of the and") shared by a constant fraction of a web
    corpus makes any shingle-equi-join quadratic on that shingle. The hot
    set is BY CONSTRUCTION tiny (only shingles with df > cap — at a sane
    cap that's the stopword tail), so it broadcasts; one agg + one
    broadcast anti-join bounds every downstream bucket at ``max_doc_freq``
    docs. Dropping ubiquitous shingles barely moves Jaccard (they carry no
    discriminating signal) but callers should treat capped scores as
    approximate.
    """
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def cap_hot_bands(
    banded: DataFrame,
    max_bucket: int,
    key_cols: tuple[str, ...] = ("band", "band_key"),
) -> DataFrame:
    """Drop rows of banded-signature relations whose (band, key) bucket
    exceeds ``max_bucket`` rows — cap_hot_shingles for LSH/simhash bands.

    Every banded SELF-join is quadratic per bucket: one boilerplate
    template shared by 10^6 pages puts 10^12 candidate pairs in that
    band's bucket regardless of banding math. The hot set is tiny by
    construction (only buckets with > max_bucket members), so it
    broadcasts; one agg + one broadcast anti-join bounds every bucket.
    Trade-off: docs whose EVERY band is hot generate no candidates (an
    exact-dup pass catches the template-identical mass far cheaper);
    near-dup recall for docs with at least one cool band is unaffected.
    Default OFF in the pair operators so small-corpus answers stay exact.
    """
    hot = (
        banded.groupBy(*key_cols)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket)
        .select(*key_cols)
    )
    return banded.join(F.broadcast(hot), list(key_cols), "left_anti")


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All candidate pairs with exact n-gram Jaccard >= threshold.

    Pairs form via a self-equi-join on shingle (docs sharing no shingle can't
    clear any positive threshold). Output: (id_a, id_b, jaccard) with a < b.
    Quadratic on hot shingles; set ``max_doc_freq`` (see cap_hot_shingles)
    to bound the worst-case join bucket at corpus scale (default off so
    scores are exact), or use minhash_lsh_pairs.
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if max_doc_freq is not None:
        sh = cap_hot_shingles(sh, max_doc_freq)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    # self-join: both sides are the O(corpus x shingles) relation —
    # broadcast is never the right build at scale (see minhash_lsh_pairs)
    a = sh.alias("a").hint("shuffle_hash")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # shuffle_hash on the PAIR side: the hinted side of a shuffle_hash
    # join is the per-partition hash BUILD side, and common (O(pairs)) is
    # far smaller than the per-doc sizes relation; the hint also pins the
    # join distributed (a hinted SHJ is chosen before any size-based
    # broadcast, so sizes' misleadingly-tiny inherited stats can't invite
    # a static broadcast of an O(corpus) relation)
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.hint("shuffle_hash")
        .join(sa, "id_a")
        .hint("shuffle_hash")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_agg(sh: DataFrame, k: int) -> DataFrame:
    """(id, shingle) -> (id, minhash: array<string>[k]) in ONE groupBy.

    h_i = min over shingles of md5(i ':' shingle), computed as k aggregate
    columns rather than an explode(xk): the k md5s are map-side projections
    and the mins partial-aggregate, so the shuffle carries exactly one
    k-wide row per (partition, id) instead of k x |shingles| rows. md5 keeps
    signatures reproducible in any engine (oracle-checkable), unlike
    partition-dependent hashes.
    """
    mins = sh.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat_ws(":", F.lit(i), F.col("shingle")))).alias(f"_h{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("minhash")
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """k MinHash values per doc. Output: (id, minhash: array<string>[k])."""
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if max_doc_freq is not None:
        sh = cap_hot_shingles(sh, max_doc_freq)
    return _minhash_agg(sh, k)


def _banded(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(id, minhash[k]) -> (id, band, band_key): md5 of the band's r = k/bands
    consecutive hashes. One explode (bands rows per id), band_key map-side."""
    r = k // bands
    return sig.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "minhash",
    ).select(
        "id",
        "band",
        F.md5(
            F.concat_ws(
                "|", *[F.element_at("minhash", F.col("band") * r + j + 1) for j in range(r)]
            )
        ).alias("band_key"),
    )


def incremental_lsh_dups(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    min_est_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    broadcast_batch: bool = True,
    new_sigs: DataFrame | None = None,
) -> DataFrame:
    """Per-batch near-dup check of an INCOMING batch against a persisted
    corpus signature table — the CDC/streaming form of minhash_lsh_pairs.

    ``new_sigs`` (id, minhash[k]) lets a caller that ALSO persists the
    batch's signatures (the streaming pipeline merges them into its sig
    table right after flagging) hand in the relation it already computed —
    otherwise the shingle explode + k-column min groupBy would run twice
    per micro-batch, once under the flags write and once under the merge.

    At ingest scale the corpus signatures (id, minhash[k]) are computed once
    and stored (e.g. a ParquetLakeTable keyed by id); each micro-batch only
    shingles its own documents. The batch's banded relation is tiny and is
    broadcast into the corpus band scan (``broadcast_batch``); the CANDIDATE
    relation, however, is bounded by band collisions — corpus-scale on
    boilerplate-heavy data — so the verify join is left to AQE (broadcast
    when small at runtime, shuffle when not). Nothing ever re-reads corpus
    text. Estimated Jaccard = fraction of the k minhash
    positions that agree (the standard MinHash estimator — values are exact
    multiples of 1/k, so thresholding is engine-portable); candidates come
    only from band collisions, so the estimator never runs all-pairs.

    Output: (new_id, dup_of, est_jaccard) — dup_of is an existing corpus id.

    ``broadcast_batch`` is a HARD hint (AQE never demotes an explicit
    broadcast): keep the default True only when the batch is known small —
    a backfill burst can make a "micro"-batch millions of docs, where the
    forced broadcast collects past spark.driver.maxResultSize and kills
    the job. Pass False to let AQE pick broadcast-vs-shuffle per batch
    from the actual relation sizes (the streaming pipeline does).
    """
    # same contract as minhash_lsh_pairs: _banded silently drops the
    # trailing k % bands minhash positions from candidate generation
    # (recall loss with no error) — reject the misconfiguration instead.
    # ValueError, not assert: spark-submit under PYTHONOPTIMIZE strips
    # asserts, silently restoring the hazard.
    if bands <= 0 or k % bands != 0:
        raise ValueError(f"k ({k}) must be divisible by bands ({bands}) > 0")
    maybe_bc = F.broadcast if broadcast_batch else (lambda d: d)
    if new_sigs is None:
        new_sigs = minhash_signatures(
            new_docs, k=k, n=n, text_col=text_col, id_col=id_col, max_doc_freq=max_doc_freq
        )
    cand = (
        _banded(corpus_sigs, k, bands)
        .alias("c")
        .join(
            maybe_bc(_banded(new_sigs, k, bands).alias("b")),
            (F.col("c.band") == F.col("b.band"))
            & (F.col("c.band_key") == F.col("b.band_key"))
            & (F.col("c.id") != F.col("b.id")),
        )
        .select(F.col("b.id").alias("new_id"), F.col("c.id").alias("dup_of"))
        .distinct()
    )
    est = F.expr(
        f"CAST(size(filter(zip_with(mh_new, mh_cor, (x, y) -> x = y), v -> v)) AS DOUBLE)"
        f" / {k}"
    )
    # the candidate relation is bounded by band COLLISIONS against the
    # corpus, NOT by batch size: one boilerplate doc whose band matches
    # 10^6 near-identical corpus rows makes it corpus-scale, so it must
    # never carry a hard broadcast hint (AQE would not demote it past the
    # driver limit). Left unhinted, AQE broadcasts it at runtime when it
    # really is small and falls back to a shuffle join when it is not —
    # only the banded BATCH side above is truly batch-bounded.
    enriched = cand.join(
        new_sigs.select(F.col("id").alias("new_id"), F.col("minhash").alias("mh_new")),
        "new_id",
    )
    return (
        corpus_sigs.select(F.col("id").alias("dup_of"), F.col("minhash").alias("mh_cor"))
        .join(enriched, "dup_of")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= min_est_jaccard)
        .select("new_id", "dup_of", "est_jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact Jaccard.

    rows-per-band r = k/bands; docs agreeing on ALL r hashes of any band
    become candidates (equi-join on (band, band_key)); candidates are then
    verified with the exact n-gram Jaccard. Output: (id_a, id_b, jaccard).
    ``max_doc_freq`` (default off) drops stop-shingles before signatures
    AND verification — see cap_hot_shingles. ``max_band_bucket`` (default
    off) additionally bounds each band BUCKET before the self-join — the
    skew cap for template-heavy corpora, see cap_hot_bands.
    """
    if bands <= 0 or k % bands != 0:
        raise ValueError(f"k ({k}) must be divisible by bands ({bands}) > 0")
    r = k // bands
    # the shingle relation feeds three plan branches (signatures + both
    # sides of the verify join) — checkpoint so it's computed once.
    # EAGER: a lazy checkpoint materializes inside the consuming SQL
    # execution, and the other branches' stages then report accumulator
    # updates against the materializing execution's metrics — 100
    # benign-but-noisy "Failed to update accumulator (Unknown class)"
    # ERRORs per run. Eager materialization runs as its own job first.
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if max_doc_freq is not None:
        sh = cap_hot_shingles(sh, max_doc_freq)
    sh = sh.localCheckpoint(eager=True)
    sig = _minhash_agg(sh, k)
    banded = _banded(sig, k, bands)
    if max_band_bucket is not None:
        banded = cap_hot_bands(banded, max_band_bucket)
    # SELF-join: both sides are O(corpus) by construction, so broadcasting
    # either side is never right — at 200k docs AQE's broadcast pick of the
    # 800k-row banded relation OOM'd an 8 GB driver (hash-relation build is
    # several x the shuffled bytes AQE compares against its threshold).
    # shuffle_hash pins a scale-safe strategy: co-partition on the band key,
    # hash-build per partition, no driver involvement, no sort.
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact-verify ONLY the candidate pairs (this is the LSH win: the full
    # all-pairs Jaccard relation is never built).
    #
    # Every verify join carries a shuffle_hash hint ON ITS SMALL
    # (candidate-derived) SIDE. Two effects, both needed: (1) a hinted SHJ
    # is selected before any size-based broadcast, so the 10^7-row shingle
    # relation — whose localCheckpoint PRESERVES the child plan's tiny
    # pre-explode size estimate — can never be statically broadcast
    # (observed: two 11.6M-row broadcast builds at 200k docs, driver OOM
    # at 8 GB; AQE cannot demote a static broadcast); (2) the HINTED side
    # is the per-partition hash BUILD side, so executors build the small
    # candidate relation, never a slice of the corpus-sized one.
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        cand.hint("shuffle_hash")
        .join(sh_a, "id_a")
        .hint("shuffle_hash")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.hint("shuffle_hash")
        .join(sa, "id_a")
        .hint("shuffle_hash")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_clusters(pairs: DataFrame, max_iterations: int = 25) -> DataFrame:
    """Group near-dup pairs into clusters: (id, cluster_id) where cluster_id
    is the MIN doc id of the connected component — the step that turns
    pairwise dedup output into keep/drop decisions (keep id == cluster_id).

    Iterative hash-min label propagation (the standard large-scale CC
    algorithm): each round every node takes the min label among itself and
    its neighbors; converges in O(diameter) rounds. Each round is one
    shuffle-join + one agg, fully distributed; the driver only checks the
    converged? flag. Lineage is cut per round with localCheckpoint so the
    plan stays O(1) deep at 10^8 edges.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iterations):
        # every side of every per-round join is O(graph), and checkpointed
        # relations carry the ORIGINAL plan's (often tiny) size estimate —
        # pin shuffle_hash so the static planner never broadcast-builds the
        # label/edge relations at 10^8 edges (same trap as the shingle
        # relations in minhash_lsh_pairs; AQE cannot demote a static
        # broadcast)
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(
                neighbor_min.hint("shuffle_hash"),
                labels.id == neighbor_min.src,
                "left",
            )
            .select(
                "id", F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl")
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o").hint("shuffle_hash"), "id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # a component with diameter > max_iterations did not converge —
        # silently returning split clusters would diverge from the exact
        # transitive-closure semantics
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds "
            "(a connected component's diameter exceeds max_iterations); "
            "raise max_iterations"
        )
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every char k-gram (rolling), keep the MIN hash of each
    window of w consecutive k-gram hashes, emit the distinct selected
    hashes. Local edits perturb only the fingerprints whose windows overlap
    the edit — unlike the whole-doc md5 `fingerprint`, which any edit flips.

    Shape note: the tempting all-array form (transform() building the
    k-gram hash array, then a second transform() taking window mins over
    it) is O(n^2): CollapseProject inlines the WHOLE first array expression
    into every element of the second, re-running md5 per (position,
    window) pair — measured 1000x slower. Explode to one row per position
    instead: each hash is computed once, the window-min is a row-frame
    window aggregate, everything whole-stage-codegen'd. Hashes are
    md5-derived (first 8 hex chars as int64) so a SQL oracle reproduces
    them bit-for-bit. Output: (id, fp) distinct rows.
    """
    base = _spread(
        docs.select(F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("_t"))
    ).withColumn("_n", F.length("_t") - k + 1)
    # one row per k-gram position (sequence guarded: n<1 would yield [1,0])
    pos = base.where(F.col("_n") >= 1).select(
        "id", "_n", F.explode(F.expr("sequence(1, _n)")).alias("_i"), "_t"
    )
    pos = pos.withColumn(
        "_h",
        F.expr(
            f"CAST(conv(substring(md5(substring(_t, CAST(_i AS INT), {k})), 1, 8), 16, 10) AS BIGINT)"
        ),
    ).drop("_t")
    win = (
        Window.partitionBy("id").orderBy("_i").rowsBetween(0, w - 1)
    )
    return (
        pos.withColumn("_f", F.min("_h").over(win))
        .where(F.col("_i") <= F.col("_n") - w + 1)  # only full windows
        .select("id", F.col("_f").alias("fp"))
        .distinct()
    )


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos0, w): one row per normalized token — the shared base
    relation of the span detect/remove pair."""
    return (
        _spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("pos0", "w"),
        )
        .where(F.col("w") != "")
    )


def _span_hashes(toks: DataFrame, span: int) -> DataFrame:
    """(id, pos, span_hash) for every full span window: the span text is
    built with span-1 lead() calls over ONE (id, pos0) window (codegen'd,
    single shuffle), never per-position array slices."""
    w = Window.partitionBy("id").orderBy("pos0")
    return (
        toks.withColumn(
            "_span",
            F.concat_ws(
                " ", F.col("w"), *[F.lead("w", i).over(w) for i in range(1, span)]
            ),
        )
        .withColumn("_last", F.lead("w", span - 1).over(w))
        .where(F.col("_last").isNotNull())  # full windows only
        .select(
            "id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.md5("_span").alias("span_hash"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    span: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-substring detection at token granularity (the
    operation behind Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": memorized spans repeat VERBATIM across
    documents even when whole docs differ). A span = ``span`` consecutive
    normalized tokens; output = every (doc, position) whose span text
    occurs in >= ``min_docs`` DISTINCT docs:
    (doc_id, pos, span_hash, n_docs), pos 1-based.

    Shape: explode to one row per token (never slice per-position arrays —
    that re-materializes the word array per row), build each span with
    span-1 lead() calls over ONE (id, pos) window (codegen'd, single
    shuffle), md5 the span text (engine-portable), then count distinct
    docs per hash two-phase (distinct -> count, no Expand) and join the
    (small, repeated-only) counts back shuffle_hash. Downstream span
    removal/masking is a per-doc merge of the flagged intervals.
    """
    if span < 2:
        raise ValueError("span must be >= 2 tokens")
    toks = _doc_tokens(docs, text_col, id_col)
    sp = _span_hashes(toks, span)
    counts = (
        sp.select("span_hash", "id")
        .distinct()
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    return sp.join(counts.hint("shuffle_hash"), "span_hash").select(
        F.col("id").alias("doc_id"), "pos", "span_hash", "n_docs"
    )


def strip_repeated_spans(
    docs: DataFrame,
    span: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REMOVAL step of exact substring dedup (Lee et al. 2022): for
    every span flagged by ``repeated_spans``, the doc with the SMALLEST
    id keeps its text; every other doc has the span's token interval
    [pos, pos+span-1] deleted (overlapping flagged intervals union).
    Output: (doc_id, clean_text, n_removed) for EVERY input doc.

    Shape: the corpus is tokenized ONCE (localCheckpoint — the span
    relation, the keep/anti-join side, and the removal totals all reuse
    it; without the cut the plan re-tokenizes the corpus ~4x). Flagged
    rows (small) explode span-wide into drop positions, distinct,
    anti-join the token relation on (id, pos), then one groupBy(id)
    reassembles clean text via array_sort(collect_list(struct(pos, w))) —
    the same one-shuffle-per-doc-rebuild cost class as scrub_boilerplate.
    Keeper rule is per HASH (min doc id), so a span shared by k docs
    survives exactly once in the smallest id.
    """
    toks0 = _doc_tokens(docs, text_col, id_col).localCheckpoint(eager=True)
    sp = _span_hashes(toks0, span)
    # ONE distinct + ONE agg yields both the repeat filter and the keeper
    # (min doc id over distinct (hash, id) == min over all occurrences)
    flagged_keep = (
        sp.select("span_hash", "id")
        .distinct()
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("_keep"))
        .where(F.col("n_docs") >= min_docs)
        .select("span_hash", "_keep")
    )
    drops = (
        sp.join(flagged_keep.hint("shuffle_hash"), "span_hash")
        .where(F.col("id") != F.col("_keep"))
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = toks0.select("id", (F.col("pos0") + 1).cast("long").alias("pos"), "w")
    kept = toks.join(drops.hint("shuffle_hash"), ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = toks.groupBy("id").agg(F.count(F.lit(1)).alias("_n_all"))
    base = docs.select(F.col(id_col).alias("id"))  # empty docs included
    return (
        base.join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.coalesce("_n_all", F.lit(0)) - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash over distinct tokens (md5-derived token hashes so the
    oracle can reproduce it). Output: (id, simhash: bigint).

    bit b of simhash = 1 iff sum over tokens of (+1 if bit b of
    md5(token) set else -1) > 0.

    Single-pass shape: ONE groupBy("id") carrying `bits` conditional-sum
    columns (the `_minhash_agg` pattern) — the per-bit +1/-1 contributions
    are map-side projections and the sums partial-aggregate, so the shuffle
    moves exactly one bits-wide row per (partition, id). (The tempting
    explode(sequence(0, bits-1)) form multiplies the distinct-token
    relation bits x before its (id, b) shuffle — a 32x shuffle-volume
    scale-killer at corpus size, for identical output.)
    """
    toks = (
        _spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    # token hash from md5 hex (engine-portable): 32-bit from the first 8 hex
    # chars; for bits > 32 the next 8 hex chars fill the high word (composed
    # with bitwise shift/or, which never overflow-checks — conv() of 16 hex
    # chars straight to long would trip the ANSI unsigned->signed cast)
    if bits <= 32:
        toks = toks.withColumn(
            "th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        )
    else:
        toks = (
            toks.withColumn("_hi", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
            .withColumn("_lo", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long"))
            .withColumn("th", F.expr("shiftleft(_hi, 32) | _lo"))
        )
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(th, {b}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"_s{b}")
            for b in range(bits)
        ]
    )
    word = None
    for b in range(bits):
        # bit 63 is the sign bit: 1 << 63 does not fit a Java long literal,
        # so use its two's-complement value (Long.MIN_VALUE) directly
        mask = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(F.col(f"_s{b}") > 0, F.lit(mask).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        word = term if word is None else word + term
    return sums.select("id", word.alias("simhash"))


def _block_layout(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(offset, width) of each of n_blocks contiguous bit blocks covering
    ``bits`` bits — widths differ by at most 1 when n_blocks doesn't divide
    bits (Manku et al. §3 allows uneven blocks; pigeonhole only needs them
    disjoint and covering)."""
    base, extra = divmod(bits, n_blocks)
    layout, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        layout.append((off, w))
        off += w
    return layout


def combination_key_bits(bits: int, n_blocks: int, max_hamming: int) -> int:
    """Width in bits of the NARROWEST combination-blocking join key — the
    join keyspace is >= 2**this. Disjoint-band blocking's keyspace is only
    2**(bits/bands); combination blocking multiplies it to ~2**(bits *
    (1 - max_hamming/n_blocks)), which is what keeps candidate volume
    sub-quadratic at 1e10 docs."""
    widths = sorted(w for _, w in _block_layout(bits, n_blocks))
    return sum(widths[: n_blocks - max_hamming])


def simhash_band_relation(
    sig: DataFrame,
    max_hamming: int,
    bands: int,
    bits: int,
    combination_blocks: int | None,
) -> DataFrame:
    """(id, simhash) -> (id, simhash, band, band_val): the blocking keys
    for simhash_hamming_pairs (its docstring has the two modes' math).
    Exposed so benches can measure candidate volume per mode."""
    if combination_blocks is not None:
        nb = combination_blocks
        if nb <= max_hamming or nb > bits:
            raise ValueError(
                f"need max_hamming ({max_hamming}) < combination_blocks "
                f"({nb}) <= bits ({bits})"
            )
        import itertools

        layout = _block_layout(bits, nb)
        if combination_key_bits(bits, nb, max_hamming) > 62:
            raise ValueError(
                "combination key exceeds 62 bits — use more blocks or a "
                "narrower fingerprint"
            )

        def block_val(off: int, w: int):
            # bit 63 survives shiftright (arithmetic) because the width
            # mask clears the smeared sign bits
            return F.expr(f"shiftright(simhash, {off})").bitwiseAND(
                F.lit((1 << w) - 1)
            )

        keys = []
        for combo in itertools.combinations(range(nb), nb - max_hamming):
            k = F.lit(0).cast("long")
            for j in combo:
                off, w = layout[j]
                k = F.shiftleft(k, w).bitwiseOR(block_val(off, w))
            keys.append(k)
        return sig.select(
            "id",
            "simhash",
            F.posexplode(F.array(*keys)).alias("band", "band_val"),
        )
    if bands <= 0 or bits % bands != 0 or max_hamming > bands - 1:
        raise ValueError(
            f"need bits ({bits}) divisible by bands ({bands}) > 0 and "
            f"max_hamming ({max_hamming}) <= bands-1 (pigeonhole coverage)"
        )
    r = bits // bands
    mask = (1 << r) - 1
    return sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.expr(f"shiftright(simhash, {b * r})").bitwiseAND(F.lit(mask))).cast(
                        "long"
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    combination_blocks: int | None = None,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, found via
    bit-band blocking (Manku et al., WWW'07: near-dup detection for web
    crawling). Output: (id_a, id_b, hamming) with id_a < id_b.

    EXACT, not approximate, in BOTH modes:

    - Default (disjoint bands): with ``bands`` equal-width bit bands and
      ``max_hamming <= bands - 1``, any pair within the Hamming radius
      differs in at most max_hamming bands, so by pigeonhole it agrees
      exactly on at least one band — banded blocking recalls every
      qualifying pair, and the post-join bit_count(xor) filter discards
      false collisions. Keyspace per band = 2**(bits/bands): right at
      sandbox..1e8 doc scale, but candidate volume grows ~n^2/keyspace, so
      16-bit keys (64 bits / 4 bands) are infeasible at 1e10 docs.

    - ``combination_blocks=b`` (Manku §3 combination blocking, the
      1e10-doc shape): split the fingerprint into b > max_hamming blocks
      and emit one join key per C(b, b - max_hamming) block COMBINATION —
      the concatenated bits of those blocks. A pair within the radius has
      at most max_hamming dirty blocks, so the combination made of its
      >= b - max_hamming clean blocks matches exactly (recall still exact
      by pigeonhole). Rows per doc rise to C(b, b-h) (20 for b=6, h=3)
      but the keyspace widens to 2**combination_key_bits(...) — 2**31 for
      64-bit fingerprints with b=6, h=3 (uneven 64/6 blocks; b=7 crosses
      2**32) — collapsing candidate volume by ~2**15 vs the disjoint mode
      at the same radius.

    Scale shape: one narrow (id, simhash) row per doc -> one explode into
    ``bands`` (or C(b, b-h)) rows -> ONE shuffle for the (band, band_val)
    equi-join; no all-pairs comparison ever happens. Candidate
    multiplicity (a pair colliding in several bands) is deduped AFTER the
    cheap xor verify so the distinct runs on the filtered (small)
    relation.
    """
    sig = simhash(docs, bits=bits, text_col=text_col, id_col=id_col)
    banded = simhash_band_relation(
        sig,
        max_hamming=max_hamming,
        bands=bands,
        bits=bits,
        combination_blocks=combination_blocks,
    )
    if max_band_bucket is not None:
        # skew cap for template-heavy corpora (recall trade-off documented
        # on cap_hot_bands; default off so answers stay exact)
        banded = cap_hot_bands(
            banded, max_band_bucket, key_cols=("band", "band_val")
        )
    # self-join of the O(corpus) banded relation: pin shuffle_hash so no
    # side is ever broadcast-built on the driver (see minhash_lsh_pairs)
    a, b = banded.alias("a").hint("shuffle_hash"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    shingle with a held-out benchmark/eval set — the standard guard against
    test-set leakage into training data.

    Scale shape: the benchmark is small by construction (eval sets are
    thousands of docs against a 100 TB corpus), so its DISTINCT shingle set
    broadcasts; the corpus side is one shingle explode + broadcast inner
    join + groupBy(id) — the corpus shingle relation is never shuffled on
    the shingle, and the only shuffle is the per-doc hit count on id.
    Output: (doc_id, n_hits, contaminated) for EVERY corpus doc, n_hits =
    number of distinct shared shingles.
    """
    c_sh = shingles(corpus, n=n, text_col=text_col, id_col=id_col)
    b_sh = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    hits = (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
