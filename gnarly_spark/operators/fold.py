"""Abelian fold reducer: per-key signed-delta sums (the erc20 analog).

The reference's running-balance reducer folds transfer events one at a time
into per-(token,owner) balances (gnarly-reducer-erc20/src/reducer.ts:40-92,
arithmetic at :81-90). The fold is commutative/associative (an abelian group),
which is exactly what lets us (a) parallelize it, (b) revert reorgs by
re-summation instead of patch inversion (SURVEY.md §7.4 risk 2).

Scale: ``groupBy().sum()`` already does partial (map-side) aggregation, but
the EXPLICIT two-phase salted variant is provided for the north_star's
"salted key-partitioned merge apply + two-phase local-then-global reduce" —
and for expressions where partial agg is unavailable (e.g. when the fold is
fused with a window). On a Zipf-head key holding 20% of 10^10 events, the
salt spreads the first phase over ``n_salts`` tasks; phase two reduces
``n_salts`` rows per key.

Dual storage: the reference stores u256 balances as DECIMAL(76,0) plus a
string copy (gnarly-reducer-erc20/src/models/sequelize.ts:13-15). Spark
decimals cap at 38 digits, so we mirror the same dual-column trick:
``total_bytes`` (decimal convenience) + ``total_bytes_str`` (canonical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_deltas(
    edits: DataFrame,
    key: str = "url",
    value: str = "delta_bytes",
    n_salts: int | None = None,
    dual_storage: bool = False,
) -> DataFrame:
    """total_bytes(key) = sum(value) — optionally via explicit salting."""
    if n_salts:
        # phase 1 (local): spread each key over n_salts sub-keys; the salt is
        # derived from op_seq so it is deterministic and uniform
        partial = (
            edits.withColumn("_salt", F.pmod(F.xxhash64(F.col("op_seq")), F.lit(n_salts)))
            .groupBy(key, "_salt")
            .agg(F.sum(value).alias("_partial"))
        )
        # phase 2 (global): at most n_salts rows per key
        out = partial.groupBy(key).agg(F.sum("_partial").alias("total_bytes"))
    else:
        out = edits.groupBy(key).agg(F.sum(value).alias("total_bytes"))
    if dual_storage:
        out = out.withColumn(
            "total_bytes_str", F.col("total_bytes").cast("decimal(38,0)").cast("string")
        )
    return out


def fold_final_state(
    page_edits: DataFrame,
    changelog: DataFrame | None = None,
    n_salts: int | None = None,
    dual_storage: bool = False,
) -> DataFrame:
    """Fold over non-reverted edits (FIXTURES.md F4 expected output).

    Reverts commute out: instead of inverting applied patches
    (utils.ts:77-103), we re-sum without the reverted blocks' rows.
    """
    ev = page_edits
    if changelog is not None:
        from gnarly_spark.operators.replay import reverted_blocks

        ev = ev.join(F.broadcast(reverted_blocks(changelog)), "block_hash", "left_anti")
    return fold_deltas(ev, n_salts=n_salts, dual_storage=dual_storage)
