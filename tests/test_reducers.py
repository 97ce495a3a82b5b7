"""Multi-reducer pipeline: append + fold + idempotent reducers running over
the same stream as the core LWW pages reducer (gnarly's N-runners-one-source
model, Gnarly.ts:22-28), with per-reducer crash/refire independence."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog, oracle_final_state
from gnarly_spark.reducers import AppendReducer, FoldReducer, IdempotentReducer
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal


def mk_reducers():
    return [
        AppendReducer(
            name="block_meta",
            project=lambda df: df.groupBy("block_id", "block_hash").agg(
                F.count("*").alias("n_events"), F.max("warc_ts").alias("block_ts")
            ),
        ),
        FoldReducer(
            name="bytes_by_site",
            key=F.regexp_extract("url", r"https://([^/]+)/", 1),
            delta=F.when(F.col("op") != "delete", F.length("html")).otherwise(0),
        ),
        IdempotentReducer(
            name="lang_histogram",
            build=lambda pages: pages.groupBy("lang").agg(F.count("*").alias("n_pages")),
        ),
    ]


def _oracle_fold(log: pd.DataFrame) -> pd.DataFrame:
    reverted = set(log.loc[log.op == "revert", "revert_of_block"].dropna())
    ev = log[(log.op != "revert") & (~log.block_hash.isin(reverted))].copy()
    ev["key"] = ev.url.str.extract(r"https://([^/]+)/")
    ev["d"] = ev.apply(
        lambda r: len(r.html) if r.op != "delete" and r.html is not None else 0, axis=1
    )
    out = ev.groupby("key", as_index=False)["d"].sum().rename(columns={"d": "total"})
    return out.sort_values("key").reset_index(drop=True)


def run_batches(spark, p, log, n_batches=4):
    chunk = (len(log) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            p.process_batch(spark.createDataFrame(part, schema=CHANGELOG_DDL), i)


def test_multi_reducer_pipeline(spark, tmp_path):
    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=31)
    reducers = mk_reducers()
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=reducers)
    run_batches(spark, p, log)

    # core pages still correct
    got_pages = (
        p.pages().select("url", "warc_ts", "text", "lang").toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(drop=True)
    assert_pdf_equal(got_pages, want)

    # append reducer: one row per (block_id, block_hash) incl. fork blocks
    bm = reducers[0].read(p).toPandas()
    assert len(bm) == log.groupby(["block_id", "block_hash"]).ngroups
    assert bm.n_events.sum() == len(log)

    # fold reducer: MERGE-added running totals == oracle resummation
    fold = (
        reducers[1].read(p).toPandas().sort_values("key").reset_index(drop=True)
    )
    want_fold = _oracle_fold(log)
    assert_pdf_equal(fold[["key", "total"]], want_fold)

    # idempotent reducer: refreshed at head from the pages table
    hist = p.refresh_idempotent()["lang_histogram"].toPandas()
    assert hist.n_pages.sum() == len(want)


def test_fold_reducer_refire_and_revert(spark, tmp_path):
    """A refired batch must not double-add; a revert in a later batch must
    negate exactly the reverted blocks' contributions."""
    log = gen_changelog(n_blocks=12, events_per_block=4, fork_depth=2, seed=12)
    reducers = [
        FoldReducer(name="bytes", key=F.lit("all"), delta=F.length("html"))
    ]
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=reducers)
    chunk = len(log) // 3 + 1
    for i in range(3):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            b = spark.createDataFrame(part, schema=CHANGELOG_DDL)
            p.process_batch(b, i)
            p.process_batch(b, i)  # immediate refire

    got = reducers[0].read(p).toPandas()
    reverted = set(log.loc[log.op == "revert", "revert_of_block"].dropna())
    ev = log[(log.op != "revert") & (~log.block_hash.isin(reverted))]
    want_total = sum(len(h) for h in ev.html if h is not None)
    assert got.total.tolist() == [float(want_total)]


def test_log_before_widens_across_batch_schemas(spark, tmp_path):
    """Reducer-attached streams must survive a widened-DDL restart: the
    retained log then holds an int batch dir next to a bigint batch dir,
    and parquet's mergeSchema option refuses that sanctioned widening
    (CANNOT_MERGE_SCHEMAS) — log_before now reuses _read_batched's
    unionByName widening."""
    import os

    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    spark.createDataFrame([(1,)], "v int").write.parquet(
        os.path.join(p.log_dir, "batch=0")
    )
    spark.createDataFrame([(1 << 40,)], "v bigint").write.parquet(
        os.path.join(p.log_dir, "batch=1")
    )
    spark.createDataFrame([(3,)], "v int").write.parquet(
        os.path.join(p.log_dir, "batch=2")
    )
    out = p.log_before(2)  # current batch excluded
    assert out.schema["v"].dataType.simpleString() == "bigint"
    assert sorted(r.v for r in out.collect()) == [1, 1 << 40]


def _mk_log(spark, rows):
    """rows: (op_seq, block_id, op, url, html, revert_of_block)"""
    from gnarly_spark.fixtures import block_hash

    pdf = pd.DataFrame(
        rows, columns=["op_seq", "block_id", "op", "url", "html", "revert_of_block"]
    )
    pdf["block_hash"] = pdf.block_id.map(block_hash)
    pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
    pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.op_seq, unit="s")
    pdf["lang"] = "en"
    pdf["reason"] = None
    pdf["html"] = pdf["html"].map(lambda v: v.encode() if isinstance(v, str) else v)
    from gnarly_spark.fixtures import CHANGELOG_COLUMNS

    return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)


def test_fold_duplicate_revert_not_double_negated(spark, tmp_path):
    """A re-delivered revert of an ALREADY-reverted block (producer retry —
    tolerated by the LWW core, whose reverted set is distinct) must not
    negate the block's contributions a second time."""
    from gnarly_spark.fixtures import block_hash

    fold = FoldReducer(
        name="len_by_url",
        key=F.col("url"),
        delta=F.when(F.col("op") != "delete", F.length("html")).otherwise(0),
    )
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=[fold])
    b1 = block_hash(1)
    # batch 0: 10 bytes for u in block 1
    p.process_batch(
        _mk_log(spark, [(1, 1, "insert", "https://u/", "x" * 10, None)]), 0
    )
    assert {(r.key, r.total) for r in fold.read(p).collect()} == {("https://u/", 10.0)}
    # batch 1: revert block 1 -> total back to 0
    p.process_batch(_mk_log(spark, [(2, 2, "revert", None, None, b1)]), 1)
    assert {(r.key, r.total) for r in fold.read(p).collect()} == {("https://u/", 0.0)}
    # batch 2: duplicate revert of block 1 -> total must STAY 0 (was -10)
    p.process_batch(_mk_log(spark, [(3, 3, "revert", None, None, b1)]), 2)
    assert {(r.key, r.total) for r in fold.read(p).collect()} == {("https://u/", 0.0)}


def test_append_reducer_refires_after_crashed_write(spark, tmp_path):
    """A write that crashed mid-job leaves the batch dir without _SUCCESS;
    the refire must re-write it (the old exists() guard skipped forever)."""
    import os

    red = AppendReducer(
        name="copy", project=lambda df: df.select("url"), schema="url string"
    )
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), reducers=[red])
    path = os.path.join(red.out_dir(p.work_dir), "batch=0")
    os.makedirs(os.path.join(path, "_temporary"))  # simulated crashed write
    batch = _mk_log(spark, [(1, 1, "insert", "https://u/", "x", None)])
    red.apply(p, batch, 0)
    assert [r.url for r in red.read(p).collect()] == ["https://u/"]
    # and a COMPLETED batch is still skipped on refire (no duplicate rows)
    red.apply(p, batch, 0)
    assert red.read(p).count() == 1
