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
