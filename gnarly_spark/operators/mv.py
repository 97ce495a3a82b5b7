"""Incremental materialized-view maintenance from an image-carrying
change feed (ParquetLakeTable.changelog / Iceberg changelog read).

The CDC loop closes here: the ingest pipeline maintains the *table*
incrementally; this operator lets a downstream aggregate be maintained
incrementally FROM that table's change feed, never rescanning the corpus.
For abelian aggregates (COUNT, SUM — gnarly's TimeVarying reducer class,
packages/gnarly-core/src/utils.ts:127-133 only ever folds appendable
deltas) each change row contributes a signed delta:

    insert / update_after  ->  +1 row,  +value
    delete / update_before ->  -1 row,  -value

so the new view is  MV' = MV ⊕ groupBy(feed).sum(signed deltas)  — cost
O(|feed| + touched groups), independent of corpus size. At 10^10 rows the
feed of one commit is orders of magnitude smaller than the table; the
groupBy shuffles only the feed and the merge join shuffles only the MV
(itself group-cardinality-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PLUS = ("insert", "update_after")


def mv_delta(
    changes: DataFrame,
    group_col: str,
    value_col: str,
    count_alias: str = "n_rows",
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Signed per-group delta of a change feed: one partial-aggregated
    groupBy over the feed only."""
    sign = F.when(F.col("_change_type").isin(*_PLUS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    return changes.groupBy(group_col).agg(
        F.sum(sign).alias(count_alias),
        F.sum(sign * F.col(value_col).cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias(sum_alias),
    )


def maintain_sum_mv(
    mv: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_col: str,
    count_alias: str = "n_rows",
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Apply an image-carrying change feed to a COUNT/SUM materialized
    view. ``mv`` has columns (group_col, count_alias, sum_alias) — the
    bootstrap is a direct aggregate of the first snapshot; every later
    commit folds its changelog() in here. Groups whose row count reaches
    zero drop out (exactly as a recompute would). Sum arithmetic runs in
    decimal so incremental-vs-recompute is bit-identical regardless of
    float addition order."""
    delta = mv_delta(changes, group_col, value_col, count_alias, sum_alias)
    m = mv.select(
        group_col,
        F.col(count_alias).alias("_mn"),
        F.col(sum_alias).cast("decimal(28,6)").alias("_ms"),
    )
    d = delta.select(
        group_col,
        F.col(count_alias).alias("_dn"),
        F.col(sum_alias).cast("decimal(28,6)").alias("_ds"),
    )
    j = m.join(d, group_col, "full_outer")
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        j.select(
            group_col,
            (F.coalesce("_mn", F.lit(0)) + F.coalesce("_dn", F.lit(0))).alias(
                count_alias
            ),
            (F.coalesce(F.col("_ms"), zero) + F.coalesce(F.col("_ds"), zero))
            .cast("decimal(28,6)")
            .alias(sum_alias),
        )
        .where(F.col(count_alias) > 0)
    )


def index_mv_delta(
    changes: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Signed per-token delta of an image-carrying change feed for the
    inverted-index MV: (token, df_delta, tf_delta) where df counts docs
    containing the token and tf counts total occurrences.

    One explode over the FEED's text (never the corpus), one per-(row,
    token) count, one token groupBy — all partial-aggregating. Rows are
    keyed (id, _change_type), which changelog() guarantees unique per
    commit range (per-key collapse), so an update contributes its before
    tokens at -1 and after tokens at +1 and unchanged tokens cancel
    exactly."""
    from gnarly_spark.operators.dedup import normalize_text

    sign = F.when(F.col("_change_type").isin(*_PLUS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    toks = changes.select(
        F.col(id_col).alias("_id"),
        F.col("_change_type").alias("_ct"),
        sign.alias("_sg"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "token"
        ),
    ).where(F.col("token") != "")
    per_doc = toks.groupBy("token", "_id", "_ct", "_sg").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return per_doc.groupBy("token").agg(
        F.sum("_sg").cast("bigint").alias("df_delta"),
        F.sum(F.col("_sg") * F.col("_c")).cast("bigint").alias("tf_delta"),
    )


def maintain_index_mv(
    index: DataFrame,
    changes: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Apply a change feed to the inverted-index census MV
    (token, doc_freq, term_freq) — the secondary text index (the band/
    stopword statistics behind functions/text.py inverted_index and
    tfidf_search) maintained at O(|feed|) instead of a corpus rescan.

    All-integer arithmetic, so incremental == recompute exactly; tokens
    whose doc_freq reaches zero drop out, exactly as a recompute would.
    Bootstrap: index_bootstrap(snapshot) on the first commit."""
    delta = index_mv_delta(changes, id_col, text_col)
    j = index.select(
        "token",
        F.col("doc_freq").alias("_mdf"),
        F.col("term_freq").alias("_mtf"),
    ).join(delta, "token", "full_outer")
    zero = F.lit(0).cast("bigint")
    return (
        j.select(
            "token",
            (F.coalesce("_mdf", zero) + F.coalesce("df_delta", zero)).alias(
                "doc_freq"
            ),
            (F.coalesce("_mtf", zero) + F.coalesce("tf_delta", zero)).alias(
                "term_freq"
            ),
        )
        .where(F.col("doc_freq") > 0)
    )


def index_bootstrap(
    snapshot: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Direct (token, doc_freq, term_freq) census of a snapshot — the MV's
    initial state, and the recompute oracle the incremental path must
    equal bit-for-bit."""
    fake = snapshot.select(
        F.col(id_col), F.col(text_col), F.lit("insert").alias("_change_type")
    )
    return index_mv_delta(fake, id_col, text_col).select(
        "token",
        F.col("df_delta").alias("doc_freq"),
        F.col("tf_delta").alias("term_freq"),
    )
