"""Mid-stream schema evolution (north_rule: added/renamed columns) —
net-new capability vs the reference, whose DDL runs only at setup
(gnarly-reducer-erc20/src/stores/sequelize.ts:18-21)."""

from __future__ import annotations

import pandas as pd

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog, oracle_final_state
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal

EVOLVED_DDL = CHANGELOG_DDL + ", content_type string"


def test_added_column_mid_stream(spark, tmp_path):
    """Later batches carry a new `content_type` column; it must appear on
    the target (null for rows last written before the evolution)."""
    log = gen_changelog(n_blocks=10, events_per_block=5, seed=8)
    half = len(log) // 2
    old, new = log.iloc[:half].copy(), log.iloc[half:].copy()
    new["content_type"] = "text/html"

    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    p.process_batch(spark.createDataFrame(old, schema=CHANGELOG_DDL), 0)
    assert "content_type" not in p.target.read().columns
    p.process_batch(spark.createDataFrame(new, schema=EVOLVED_DDL), 1)

    tgt = p.target.read().toPandas()
    assert "content_type" in tgt.columns
    # urls whose winner came from the evolved half carry the value
    want = oracle_final_state(log)
    winners_new = set(want[want.warc_ts >= new.warc_ts.min()].url) & set(new.url)
    got_ct = tgt.set_index("url").content_type
    assert any(got_ct.get(u) == "text/html" for u in winners_new)
    # and final page state still matches the oracle
    got = (
        p.pages()
        .select("url", "warc_ts", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(got, want[["url", "warc_ts", "text", "lang"]])


def test_widened_column_mid_stream_with_retained_log(spark, tmp_path):
    """A sanctioned type widening (int -> bigint after a restart with
    widened source DDL) must not wedge the retained-log read: batch 0
    appends an int log partition, batch 1 a bigint one, and batch 1's
    adjudication re-read spans both (parquet mergeSchema refuses INT vs
    BIGINT — the read derives the widened union schema instead)."""
    log = gen_changelog(n_blocks=10, events_per_block=5, seed=3)
    half = len(log) // 2
    old, new = log.iloc[:half].copy(), log.iloc[half:].copy()
    old["score"] = pd.array([1] * len(old), dtype="int32")
    new["score"] = pd.array([2**40] * len(new), dtype="int64")

    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    p.process_batch(
        spark.createDataFrame(old, schema=CHANGELOG_DDL + ", score int"), 0
    )
    p.process_batch(
        spark.createDataFrame(new, schema=CHANGELOG_DDL + ", score bigint"), 1
    )
    tgt = p.target.read().toPandas()
    assert str(tgt.score.dtype) == "int64"
    # winners from the widened half carry the big value; page state intact
    assert (tgt.score == 2**40).any()
    got = (
        p.pages()
        .select("url", "warc_ts", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(got, oracle_final_state(log)[["url", "warc_ts", "text", "lang"]])


def test_renamed_column_mid_stream(spark, tmp_path):
    """`lang` renamed to `language` upstream; rename_map restores it."""
    log = gen_changelog(n_blocks=8, events_per_block=4, seed=4)
    half = len(log) // 2
    old, new = log.iloc[:half].copy(), log.iloc[half:].copy()
    renamed = new.rename(columns={"lang": "language"})
    renamed_ddl = CHANGELOG_DDL.replace("lang string", "language string")

    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), rename_map={"language": "lang"}
    )
    p.process_batch(spark.createDataFrame(old, schema=CHANGELOG_DDL), 0)
    p.process_batch(spark.createDataFrame(renamed, schema=renamed_ddl), 1)
    got = (
        p.pages()
        .select("url", "warc_ts", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(drop=True)
    assert_pdf_equal(got, want)
    assert got.lang.notna().all()
