"""Live-tail semantics: a processingTime-triggered query picks up files
appearing after start (T1 longpoll analog, Web3Api.ts:92-100), then stops
gracefully draining in-flight work (T9, Blockstream.ts:134-143); reset()
wipes engine state (C9, Gnarly.ts:44-56)."""

from __future__ import annotations

import os
import time

import pytest

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog, oracle_final_state
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal


def test_live_tail_and_graceful_stop(spark, tmp_path):
    log = gen_changelog(n_blocks=10, events_per_block=4, seed=44)
    src = str(tmp_path / "changelog")
    os.makedirs(src)
    half = len(log) // 2
    spark.createDataFrame(log.iloc[:half], schema=CHANGELOG_DDL).coalesce(1).write.parquet(
        os.path.join(src, "chunk=0000")
    )
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    q = p.start(src, available_now=False, processing_time="1 seconds",
                max_files_per_trigger=None)
    try:
        deadline = time.monotonic() + 60
        while not p.metrics() and time.monotonic() < deadline:
            time.sleep(0.5)
        assert p.metrics(), "first batch never processed"
        # new data arrives while the query is live (the longpoll tick)
        spark.createDataFrame(log.iloc[half:], schema=CHANGELOG_DDL).coalesce(1).write.parquet(
            os.path.join(src, "chunk=0001")
        )
        deadline = time.monotonic() + 60
        while len(p.metrics()) < 2 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert len(p.metrics()) >= 2, "live tail never picked up the new file"
    finally:
        q.stop()  # graceful: checkpoint guarantees no loss
    got = (
        p.pages().select("url", "warc_ts", "text", "lang").toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(drop=True)
    assert_pdf_equal(got, want)


def test_reset_wipes_state(spark, tmp_path):
    log = gen_changelog(n_blocks=5, events_per_block=4, seed=45)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    p.process_batch(spark.createDataFrame(log, schema=CHANGELOG_DDL), 0)
    assert p.pages().count() > 0
    p.reset()
    assert p.target.current_version() == -1
    assert p._log_batches() == []
    assert p.metrics() == []
    # and the pipeline is usable again from scratch
    p.process_batch(spark.createDataFrame(log, schema=CHANGELOG_DDL), 0)
    want = oracle_final_state(log)
    assert p.pages().count() == len(want)
