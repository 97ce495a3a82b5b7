"""JSONL changelog source: byte-identical round trip (binary html via
base64, microsecond timestamps), dead-letter routing for poison pills, and
an end-to-end pipeline drain over a JSONL tail matching the pandas replay
oracle — the reference's JSON ingestion surface (Web3Api.ts:64-130)
re-expressed as a format-agnostic Spark source."""

from __future__ import annotations

import json
import math
import os
import shutil

import pandas as pd

from gnarly_spark.fixtures import gen_changelog, oracle_final_state
from gnarly_spark.sources.changelog import order_files_by_name
from gnarly_spark.sources.jsonl import (
    jsonl_dead_letters,
    jsonl_events,
    read_changelog_jsonl,
    write_changelog_jsonl,
)
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal


def write_jsonl_chunks(spark, to_spark, log: pd.DataFrame, src: str, n_chunks: int):
    """Flat, name-ordered .txt chunk files (FileStreamSource delivers by
    mtime; order_files_by_name stamps name order)."""
    os.makedirs(src, exist_ok=True)
    chunk = math.ceil(len(log) / n_chunks)
    for i in range(n_chunks):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if not len(part):
            continue
        tmpd = os.path.join(src, f".tmp{i}")
        write_changelog_jsonl(to_spark(part), tmpd, n_files=1)
        pf = next(f for f in os.listdir(tmpd) if f.startswith("part-"))
        os.rename(os.path.join(tmpd, pf), os.path.join(src, f"{i:04d}.txt"))
        shutil.rmtree(tmpd)
    order_files_by_name(src, "*.txt")


def test_jsonl_roundtrip_byte_identical(spark, to_spark, tmp_path):
    log = gen_changelog(n_blocks=6, events_per_block=4)
    df = to_spark(log)
    path = str(tmp_path / "jl")
    write_changelog_jsonl(df, path, n_files=2)
    parsed = read_changelog_jsonl(spark, path)
    back = jsonl_events(parsed)
    a = df.toPandas().sort_values("op_seq").reset_index(drop=True)
    b = back.toPandas().sort_values("op_seq").reset_index(drop=True)
    assert_pdf_equal(a, b)  # html bytes + timestamps exact
    assert jsonl_dead_letters(parsed).count() == 0


def test_jsonl_dead_letter_routing(spark, to_spark, tmp_path):
    log = gen_changelog(n_blocks=4, events_per_block=3)
    path = str(tmp_path / "jl")
    write_changelog_jsonl(to_spark(log), path, n_files=1)
    with open(os.path.join(path, "z-poison.txt"), "w") as f:
        f.write("this is not json\n")  # -> malformed
        f.write(json.dumps({"op": "update", "url": "https://x/1"}) + "\n")  # -> missing_required
        f.write(json.dumps({"op_seq": "oops", "op": "update", "url": "https://x/2"}) + "\n")  # -> malformed (type)
    parsed = read_changelog_jsonl(spark, path)
    assert jsonl_events(parsed).count() == len(log)  # poison never enters
    dead = jsonl_dead_letters(parsed).toPandas()
    assert sorted(dead["reason"]) == ["malformed", "malformed", "missing_required"]
    # the raw line is preserved verbatim for replay-after-fix
    assert "this is not json" in set(dead["raw"])


def test_pipeline_drains_jsonl_tail(spark, to_spark, tmp_path):
    """The full CDC engine over a JSONL tail: 4 micro-batches with a reorg,
    poison lines dead-lettered per batch, final table == pandas replay
    oracle including the binary html payload."""
    log = gen_changelog(n_blocks=12, events_per_block=4, fork_depth=2)
    src = str(tmp_path / "jl")
    write_jsonl_chunks(spark, to_spark, log, src, n_chunks=4)
    # poison two batches: append junk to chunks 0 and 2, restamp order
    for i in (0, 2):
        with open(os.path.join(src, f"{i:04d}.txt"), "a") as f:
            f.write(f"poison line {i}\n")
    order_files_by_name(src, "*.txt")
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    p.start(
        src, available_now=True, max_files_per_trigger=1, source_format="jsonl"
    ).awaitTermination()
    assert len(p.metrics()) >= 4
    got = (
        p.pages()
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "warc_ts", "html", "text", "lang"]]
    )
    want = oracle_final_state(log)[["url", "warc_ts", "html", "text", "lang"]]
    assert_pdf_equal(got, want)
    dead = p.dead_letters().toPandas()
    assert sorted(dead["raw"]) == ["poison line 0", "poison line 2"]
    assert set(dead["reason"]) == {"malformed"}


def test_jsonl_retain_log_off_reads_source(spark, to_spark, tmp_path):
    """retain_log=False + JSONL: revert adjudication re-reads the JSONL
    source (format-aware _read_source) instead of a retained parquet log."""
    log = gen_changelog(n_blocks=10, events_per_block=4, fork_depth=2)
    src = str(tmp_path / "jl")
    write_jsonl_chunks(spark, to_spark, log, src, n_chunks=3)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), retain_log=False)
    p.start(
        src, available_now=True, max_files_per_trigger=1, source_format="jsonl"
    ).awaitTermination()
    got = (
        p.pages()
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "warc_ts", "text", "lang"]]
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(
        drop=True
    )
    assert_pdf_equal(got, want)


def test_all_poison_trigger_leaves_no_unprunable_range(spark, to_spark, tmp_path):
    """A trigger whose every line dead-letters yields a 0-row batch. It
    must NOT record a seq-range entry: its max_block would be None, which
    the keep-unprovable retention rule retains (and re-reads) forever."""
    log = gen_changelog(n_blocks=9, events_per_block=4, fork_depth=2)
    src = str(tmp_path / "jl")
    write_jsonl_chunks(spark, to_spark, log, src, n_chunks=3)
    # a whole extra file of poison — one all-dead-letter micro-batch
    with open(os.path.join(src, "0001a.txt"), "w") as f:
        f.write("not json at all\n{also: bad\n")
    order_files_by_name(src, "*.txt")
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), retain_log=False)
    p.start(
        src, available_now=True, max_files_per_trigger=1, source_format="jsonl"
    ).awaitTermination()
    ranges = p._seq_ranges()
    assert len(ranges) >= 1
    assert all(r["max_block"] is not None for r in ranges)
    assert p.dead_letters().count() == 2
    got = (
        p.pages()
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "warc_ts", "text", "lang"]]
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(
        drop=True
    )
    assert_pdf_equal(got, want)
