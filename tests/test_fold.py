"""Abelian-fold reducer (erc20 analog): per-key signed-delta sums with
revert-by-resummation, plain vs explicitly-salted two-phase."""

from __future__ import annotations

from gnarly_spark.fixtures import gen_changelog, gen_page_edits, oracle_fold
from gnarly_spark.operators.fold import fold_deltas, fold_final_state
from tests.conftest import assert_pdf_equal

EDITS_DDL = "op_seq long, block_hash string, url string, delta_bytes long, warc_ts timestamp"


def test_fold_matches_oracle(spark):
    edits = gen_page_edits(n_blocks=40, events_per_block=8)
    got = (
        fold_deltas(spark.createDataFrame(edits, schema=EDITS_DDL))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(got, oracle_fold(edits))


def test_salted_two_phase_identical(spark):
    edits = gen_page_edits(n_blocks=40, events_per_block=8)
    df = spark.createDataFrame(edits, schema=EDITS_DDL)
    plain = fold_deltas(df).toPandas().sort_values("url").reset_index(drop=True)
    salted = (
        fold_deltas(df, n_salts=16).toPandas().sort_values("url").reset_index(drop=True)
    )
    assert_pdf_equal(plain, salted)


def test_fold_with_reverts(spark, to_spark):
    """Reverted blocks' deltas drop out by re-summation — no patch
    inversion (the reference's utils.ts:77-103 path is unnecessary for
    abelian state)."""
    changelog = gen_changelog(n_blocks=12, events_per_block=4, fork_depth=3, seed=6)
    edits = gen_page_edits(n_blocks=16, events_per_block=6, seed=5)
    # plant a third of the edits into blocks the changelog reverts
    reverted_hashes = list(changelog.revert_of_block.dropna().unique())
    edits.loc[edits.index % 3 == 0, "block_hash"] = [
        reverted_hashes[i % len(reverted_hashes)]
        for i in range((len(edits) + 2) // 3)
    ]
    got = (
        fold_final_state(
            spark.createDataFrame(edits, schema=EDITS_DDL), to_spark(changelog)
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = oracle_fold(edits, changelog)
    assert len(want) and (set(edits.block_hash) & set(changelog.revert_of_block.dropna()))
    assert_pdf_equal(got, want)


def test_dual_storage(spark):
    edits = gen_page_edits(n_blocks=10, events_per_block=5)
    got = fold_deltas(
        spark.createDataFrame(edits, schema=EDITS_DDL), dual_storage=True
    ).toPandas()
    assert (got.total_bytes_str == got.total_bytes.astype(int).astype(str)).all()
