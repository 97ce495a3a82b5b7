"""End-to-end streaming pipeline tests: incremental == full replay ==
pandas oracle; exactly-once under refires; reorg across micro-batches;
crash resume from checkpoint. Ports the reference's core invariants
(Ourbit.spec.ts:155-179, Blockstream.spec.ts:195-277)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F
import pytest

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog, oracle_final_state
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal

PAGE_COLS = ["url", "warc_ts", "text", "lang"]


def write_changelog_files(spark, pdf: pd.DataFrame, out_dir: str, n_files: int):
    """Split a changelog into n sequential parquet files (micro-batch feed)."""
    os.makedirs(out_dir, exist_ok=True)
    chunk = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            spark.createDataFrame(part, schema=CHANGELOG_DDL).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"chunk={i:04d}"))


def run_stream(pipeline, changelog_dir):
    q = pipeline.start(changelog_dir, available_now=True, max_files_per_trigger=1)
    q.awaitTermination()


def _got(pipeline):
    return (
        pipeline.pages()
        .select(*PAGE_COLS)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def _want(log):
    return oracle_final_state(log)[PAGE_COLS].reset_index(drop=True)


def test_incremental_equals_replay_linear(spark, tmp_path):
    log = gen_changelog(n_blocks=20, events_per_block=5)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=5)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    run_stream(p, src)
    assert len(p.metrics()) >= 2, "must have processed multiple micro-batches"
    # undo attribution contract (review r05): any batch that saved prior
    # rows carries rows/bytes in its phase metrics — the keys
    # tools/sustained_job.py reads for burst attribution
    undo_batches = [
        m for m in p.metrics() if m["phase_s"].get("undo_rows") is not None
    ]
    assert undo_batches, "later batches must have replaced rows"
    for m in undo_batches:
        assert m["phase_s"]["undo_bytes"] > 0
        assert m["phase_s"]["undo_rows"] > 0
    assert_pdf_equal(_got(p), _want(log))


def test_rebucket_mid_stream_preserves_exactly_once(spark, tmp_path):
    """An operator rebuckets the target BETWEEN micro-batches (the layout
    migration a growing table eventually needs): processing resumes on the
    new layout, refires of pre-migration batches stay no-ops (batch_ids
    carry across rebucket), a reorg spanning the migration still resolves,
    and the final table equals one-shot replay."""
    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=33)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    n_batches = 4
    chunk = (len(log) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if not len(part):
            continue
        p.process_batch(spark.createDataFrame(part, schema=CHANGELOG_DDL), i)
        if i == 1:  # migrate mid-stream: 16 -> 64 buckets
            stats = p.target.rebucket(64)
            assert stats["n_buckets"] == 64
            # refire of a PRE-migration batch must still be a no-op
            refire = log.iloc[0:chunk]
            v = p.target.current_version()
            p.process_batch(spark.createDataFrame(refire, schema=CHANGELOG_DDL), 0)
            assert p.target.current_version() == v, "refired batch re-applied"
    assert p.target.n_buckets == 64
    assert_pdf_equal(_got(p), _want(log))


def test_reorg_across_batches(spark, tmp_path):
    """Fork events and their reverts land in DIFFERENT micro-batches —
    the incremental revert path (target re-adjudication), not just replay."""
    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=21)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=8)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))


def test_refired_batch_is_noop(spark, tmp_path):
    log = gen_changelog(n_blocks=8, events_per_block=5, seed=3)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    half = len(log) // 2
    b0 = spark.createDataFrame(log.iloc[:half], schema=CHANGELOG_DDL)
    b1 = spark.createDataFrame(log.iloc[half:], schema=CHANGELOG_DDL)
    p.process_batch(b0, 0)
    p.process_batch(b1, 1)
    v = p.target.current_version()
    before = _got(p)
    p.process_batch(b1, 1)  # foreachBatch refire after simulated crash
    assert p.target.current_version() == v, "refire must not commit"
    assert_pdf_equal(_got(p), before)
    assert_pdf_equal(_got(p), _want(log))


def test_crash_resume_from_checkpoint(spark, tmp_path):
    """Stop after part of the backlog, restart with same checkpoint —
    offsets in the WAL + state in the lake table = no replay needed."""
    log = gen_changelog(n_blocks=20, events_per_block=5, seed=17)
    src = str(tmp_path / "changelog")
    # phase 1: only first half of the files exist
    half_rows = len(log) // 2
    write_changelog_files(spark, log.iloc[:half_rows], src, n_files=4)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    run_stream(p, src)
    n_batches_phase1 = len(p.metrics())
    assert n_batches_phase1 >= 2
    # "crash": new pipeline object (fresh driver), same work/checkpoint dirs
    p2 = CdcIngestPipeline(spark, str(tmp_path / "work"))
    # more files arrive
    more = log.iloc[half_rows:].copy()
    os.makedirs(src, exist_ok=True)
    import pyspark.sql.functions as F  # noqa

    for i, start in enumerate(range(0, len(more), 30)):
        part = more.iloc[start : start + 30]
        spark.createDataFrame(part, schema=CHANGELOG_DDL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk={100 + i:04d}"))
    run_stream(p2, src)
    assert_pdf_equal(_got(p2), _want(log))


def test_revert_older_than_retained_prior_value(spark, tmp_path):
    """A url's newest event is reverted while its PREVIOUS value has been
    pruned from the event log — the target row must resurface as the
    winner (the 'candidates include the target' path)."""
    rows = []

    def ev(op_seq, block_id, op, url, html, revert_of=None):
        from gnarly_spark.fixtures import EPOCH, block_hash

        rows.append(
            {
                "op_seq": op_seq,
                "block_id": block_id,
                "block_hash": block_hash(block_id),
                "parent_hash": block_hash(block_id - 1),
                "op": op,
                "url": url,
                "warc_ts": EPOCH + pd.Timedelta(seconds=60 * block_id),
                "html": html,
                "lang": "en",
                "revert_of_block": revert_of,
                "reason": "T",
            }
        )

    from gnarly_spark.fixtures import block_hash

    ev(1, 0, "insert", "https://u.example/1", b"<p>v1</p>")
    ev(2, 50, "update", "https://u.example/1", b"<p>v2</p>")
    ev(3, 51, "revert", None, None, revert_of=block_hash(50))
    log = pd.DataFrame(rows)

    # retention=5 blocks: by the time the revert arrives, the insert (block 0)
    # is long pruned from the event log; only the target row remembers v1
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), retention_blocks=5)
    from gnarly_spark.fixtures import CHANGELOG_DDL as DDL

    p.process_batch(spark.createDataFrame(log.iloc[[0]], schema=DDL), 0)
    assert p._log_batches() == [0]
    p.process_batch(spark.createDataFrame(log.iloc[[1]], schema=DDL), 1)
    assert p._log_batches() == [1], "block-0 batch must be pruned by retention"
    p.process_batch(spark.createDataFrame(log.iloc[[2]], schema=DDL), 2)
    got = _got(p)
    assert got.url.tolist() == ["https://u.example/1"]
    assert got.text.tolist() == ["v1"], "pre-reorg value must resurface"


def test_salted_pipeline_agrees(spark, tmp_path):
    log = gen_changelog(n_blocks=12, events_per_block=8, zipf_s=1.2, seed=33)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=4)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), salt_partitions=8)
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))


def test_audit_rows_appended_and_deterministic(spark, tmp_path):
    log = gen_changelog(n_blocks=6, events_per_block=4, seed=2)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=2)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    run_stream(p, src)
    audit = spark.read.parquet(os.path.join(p.audit_dir, "batch=*")).toPandas()
    assert len(audit) == len(log)
    assert audit.uuid.is_unique
    # deterministic: same event -> same uuid on regeneration
    from gnarly_spark.operators.audit import audit_rows

    again = audit_rows(
        spark.createDataFrame(log, schema=CHANGELOG_DDL), batch_id=0
    ).toPandas()
    assert set(again.uuid) == set(audit.uuid)


def test_out_of_order_batch_beyond_retention_fails_fast(spark, to_spark, tmp_path):
    """A batch whose newest block is > retention behind the head cannot be
    adjudicated (its reconciliation context may be pruned) — the pipeline
    must refuse it loudly, not corrupt state (ports the reference's resume
    consistency assert, ReducerRunner.ts:78-83)."""
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    log = gen_changelog(n_blocks=30, events_per_block=3, seed=3)
    p = CdcIngestPipeline(spark, str(tmp_path / "w"), retention_blocks=5)
    head = to_spark(log[log.block_id >= 20])
    stale = to_spark(log[log.block_id < 10])
    p.process_batch(head, 0)
    with pytest.raises(RuntimeError, match="ordering violation"):
        p.process_batch(stale, 1)


def test_mid_batch_crash_before_merge_repairs_on_refire(spark, to_spark, tmp_path):
    """Crash between the audit append and the MERGE commit (the reference's
    save-tx-then-apply gap, Ourbit.ts:144-150): the refired batch must
    complete the merge exactly once, with no duplicate audit rows and the
    same final state as an uninterrupted run."""
    from gnarly_spark.fixtures import gen_changelog, oracle_final_state
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    log = gen_changelog(n_blocks=10, events_per_block=4, seed=21)
    half = log.block_id.max() // 2
    b0, b1 = log[log.block_id <= half], log[log.block_id > half]

    p = CdcIngestPipeline(spark, str(tmp_path / "w"))
    p.process_batch(to_spark(b0), 0)

    real_merge = p.target.merge
    calls = {"n": 0}

    def crashing_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before commit")
        return real_merge(*a, **kw)

    p.target.merge = crashing_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        p.process_batch(to_spark(b1), 1)
    # refire (what the checkpointed stream does on restart)
    p.process_batch(to_spark(b1), 1)
    p.target.merge = real_merge

    got = (
        p.pages()
        .select("url", "warc_ts", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = oracle_final_state(log)[["url", "warc_ts", "text", "lang"]].reset_index(drop=True)
    assert_pdf_equal(got, want)
    # audit rows: exactly one set per (batch, op_seq) — overwrite, no dupes
    audit = spark.read.parquet(str(tmp_path / "w" / "audit" / "batch=*"))
    assert audit.count() == audit.select("uuid").distinct().count() == len(log)


def test_retain_log_off_matches_replay_with_reorg(spark, tmp_path):
    """retain_log=False (replayable source: the changelog dir IS the
    retained log): no per-batch event-log append, revert adjudication
    reads the source — final state must still equal the one-pass replay,
    including a reorg crossing micro-batch boundaries."""
    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=21)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=8)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), retain_log=False)
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))
    assert p._log_batches() == []  # nothing was appended to the event log
    assert len(p.metrics()) >= 2


def test_retain_log_off_rejects_reducers_and_direct_batches(spark, tmp_path):
    from gnarly_spark.reducers import AppendReducer

    with pytest.raises(ValueError, match="retain_log=False"):
        CdcIngestPipeline(
            spark,
            str(tmp_path / "w1"),
            retain_log=False,
            reducers=[AppendReducer("audit_noop", lambda df: df)],
        )
    p = CdcIngestPipeline(spark, str(tmp_path / "w2"), retain_log=False)
    b = spark.createDataFrame(
        gen_changelog(n_blocks=2, events_per_block=3), schema=CHANGELOG_DDL
    )
    with pytest.raises(RuntimeError, match="source dir"):
        p.process_batch(b, 0)


def test_retain_log_off_batch_spans_more_than_retention(spark, tmp_path):
    """Regression: with retain_log=False, a micro-batch spanning MORE
    blocks than the retention window must not have its own older-block
    events (or same-batch losers) dropped from adjudication — retention
    pruning is batch-granular, never mid-batch. (Caught live: a 500-block
    batch against retention_blocks=200 silently deleted 36 pages.)"""
    log = gen_changelog(n_blocks=30, events_per_block=5, fork_depth=2, seed=7)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=3)
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), retention_blocks=5, retain_log=False
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))


def test_datagen_changelog_streaming_matches_replay_both_modes(spark, tmp_path):
    """The distributed benchmark changelog (datagen, reverts ON) through
    the real pipeline == one-shot replay, for retain_log True AND False.
    Locks the datagen delivery-order contract: revert rows interleave
    right after the block they undo (caught live at 10M events: reverts
    carried op_seq past every event, arrived in the final micro-batch as
    contract-violating deep reorgs, and diverged by one page)."""
    from gnarly_spark.datagen import gen_changelog_spark
    from gnarly_spark.sources.changelog import order_files_by_name

    log = gen_changelog_spark(
        spark, 4000, events_per_block=50, revert_every_blocks=10, skew=0.2
    )
    src = str(tmp_path / "cl")
    log.repartitionByRange(4, "op_seq").sortWithinPartitions("op_seq").write.parquet(src)
    order_files_by_name(src)

    from gnarly_spark.operators.replay import last_writer_wins, live_events
    from pyspark.sql import functions as F

    winners = last_writer_wins(live_events(spark.read.parquet(src))).where(
        F.col("op") != "delete"
    )
    want = sorted((r.url, r.op_seq) for r in winners.select("url", "op_seq").collect())
    for i, retain in enumerate((True, False)):
        p = CdcIngestPipeline(
            spark,
            str(tmp_path / f"w{i}"),
            retention_blocks=30,
            retain_log=retain,
            with_text=False,
        )
        run_stream(p, src)
        got = sorted(
            (r.url, r.op_seq)
            for r in p.target.read()
            .select("url", F.col("_op_seq").alias("op_seq"))
            .collect()
        )
        assert got == want, f"retain_log={retain} diverged from replay"


def test_streaming_dedup_flags_cross_batch_dups(spark, tmp_path):
    """dedup_minhash: a batch's new page version that duplicates an
    already-ingested url is flagged against the persisted signature table;
    refires are no-ops; deleting a url removes its signature so later dups
    match surviving copies instead."""
    from gnarly_spark.fixtures import block_hash, html_for

    def mk(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["op_seq", "block_id", "op", "url", "html", "revert_of_block"],
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.op_seq, unit="s")
        pdf["lang"] = "en"
        pdf["reason"] = None
        from gnarly_spark.fixtures import CHANGELOG_COLUMNS

        return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)

    ha, hb = html_for("https://a", 1), html_for("https://b", 2)
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), dedup_minhash={"min_est_jaccard": 0.5}
    )
    p.process_batch(
        mk([(1, 0, "insert", "https://a", ha, None),
            (2, 0, "insert", "https://b", hb, None)]), 0)
    assert p.dup_flags().count() == 0  # first batch: empty corpus

    # batch 1: c duplicates a's html byte-for-byte; b gets a fresh version
    b1 = mk([(3, 1, "insert", "https://c", ha, None),
             (4, 1, "update", "https://b", html_for("https://b", 4), None)])
    p.process_batch(b1, 1)
    flags = {(r.url, r.dup_of): r.est_jaccard for r in p.dup_flags().collect()}
    assert flags == {("https://c", "https://a"): 1.0}

    sig_v = p.sig_table.current_version()
    p.process_batch(b1, 1)  # refire: no new flags, no new sig commit
    assert p.sig_table.current_version() == sig_v
    assert {(r.url, r.dup_of) for r in p.dup_flags().collect()} == {("https://c", "https://a")}

    # batch 2: delete a; batch 3: d duplicates the shared text -> matches c
    p.process_batch(mk([(5, 2, "delete", "https://a", None, None)]), 2)
    p.process_batch(mk([(6, 3, "insert", "https://d", ha, None)]), 3)
    got = {(r.url, r.dup_of) for r in p.dup_flags().collect()}
    assert ("https://d", "https://c") in got and ("https://d", "https://a") not in got


def test_dedup_stale_signature_removed_on_signatureless_update(spark, tmp_path):
    """When a url's NEW version yields no minhash signature (null html ->
    null text), its OLD signature must leave the corpus table — otherwise a
    later page matching the old content is flagged as a dup of content the
    corpus no longer holds."""
    from gnarly_spark.fixtures import block_hash, html_for

    def mk(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["op_seq", "block_id", "op", "url", "html", "revert_of_block"],
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.op_seq, unit="s")
        pdf["lang"] = "en"
        pdf["reason"] = None
        from gnarly_spark.fixtures import CHANGELOG_COLUMNS

        return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)

    ha = html_for("https://a", 1)
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), dedup_minhash={"min_est_jaccard": 0.5}
    )
    p.process_batch(mk([(1, 0, "insert", "https://a", ha, None)]), 0)
    assert p.sig_table.read().count() == 1
    # a's new version has no html -> no extracted text -> no signature
    p.process_batch(mk([(2, 1, "update", "https://a", None, None)]), 1)
    assert p.sig_table.read().count() == 0  # stale signature deleted
    # a page matching a's OLD content must NOT be flagged against it
    p.process_batch(mk([(3, 2, "insert", "https://b", ha, None)]), 2)
    assert p.dup_flags().count() == 0


def test_dedup_stale_signature_same_batch(spark, tmp_path):
    """The ONE-batch form of the stale-signature case must agree with the
    two-batch split: a signatureless update of url a and an insert of url b
    matching a's OLD content arriving in the SAME micro-batch — a's old
    signature must not flag b (flags are computed against the corpus minus
    every url this batch replaces, not just the ones with usable text)."""
    from gnarly_spark.fixtures import CHANGELOG_COLUMNS, block_hash, html_for

    def mk(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["op_seq", "block_id", "op", "url", "html", "revert_of_block"],
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.op_seq, unit="s")
        pdf["lang"] = "en"
        pdf["reason"] = None
        return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)

    ha = html_for("https://a", 1)
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), dedup_minhash={"min_est_jaccard": 0.5}
    )
    p.process_batch(mk([(1, 0, "insert", "https://a", ha, None)]), 0)
    assert p.sig_table.read().count() == 1
    # same batch: a loses its signature AND b arrives with a's old content
    p.process_batch(
        mk(
            [
                (2, 1, "update", "https://a", None, None),
                (3, 1, "insert", "https://b", ha, None),
            ]
        ),
        1,
    )
    assert p.dup_flags().count() == 0  # b not flagged against removed content
    sigs = {r.url for r in p.sig_table.read().select("url").collect()}
    assert sigs == {"https://b"}  # a's stale signature gone, b's live


def test_dedup_requires_with_text(spark, tmp_path):
    """dedup_minhash over a pipeline that never materializes text must fail
    at construction, not mid-batch."""
    with pytest.raises(ValueError, match="with_text"):
        CdcIngestPipeline(
            spark, str(tmp_path / "work"), with_text=False, dedup_minhash={}
        )


def test_mor_target_with_compaction_matches_replay(spark, tmp_path):
    """Full pipeline over a MOR target (O(batch) delta commits +
    periodic compaction) must agree with the replay oracle exactly —
    including a reorg whose revert lands after the fork's delta was
    already folded into base files by compact()."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=29)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=8)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        target=ParquetLakeTable(
            spark, str(tmp_path / "work" / "pages"), key="url", mode="mor"
        ),
        compact_every=3,
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))
    # compaction actually ran mid-stream and the backlog stayed bounded
    assert any("compact" in m["phase_s"] for m in p.metrics())
    pending = sum(
        len(fl) for fl in p.target._manifest().get("deltas", {}).values()
    )
    assert pending <= 3 * p.target.n_buckets  # at most compact_every batches


class _ModelessTarget:
    """Duck-typed sink exposing only the shared LakeTable surface — no
    .mode/.path/.n_buckets (the IcebergLakeTable shape). Delegates the
    actual storage to a wrapped ParquetLakeTable."""

    _HIDDEN = {"mode", "path", "n_buckets", "files_per_bucket"}

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        if name in _ModelessTarget._HIDDEN:
            raise AttributeError(name)
        return getattr(self.__dict__["_inner"], name)


def test_compact_cadence_tolerates_modeless_target(spark, tmp_path):
    """compact_every on a target WITHOUT a .mode attribute (the Iceberg
    surface) must be a post-commit no-op, not an AttributeError that kills
    the stream after every merge (and again on each refire, wedging it)."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    log = gen_changelog(n_blocks=12, events_per_block=5, seed=31)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=4)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        target=_ModelessTarget(
            ParquetLakeTable(spark, str(tmp_path / "work" / "pages"), key="url")
        ),
        compact_every=1,  # would hit the cadence check on every batch
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))
    assert not any("compact" in m["phase_s"] for m in p.metrics())


def test_reset_preserves_files_per_bucket(spark, tmp_path):
    """reset() rebuilds the target handle — it must carry the
    parallel-write knob, not silently revert to 1 file per bucket."""
    log = gen_changelog(n_blocks=6, events_per_block=4)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=2)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), files_per_bucket=4)
    run_stream(p, src)
    p.reset()
    assert p.target.files_per_bucket == 4
    # and the reset table still ingests correctly at that layout
    p2 = CdcIngestPipeline(
        spark, str(tmp_path / "work"), files_per_bucket=4,
    )
    run_stream(p2, src)
    assert_pdf_equal(_got(p2), _want(log))


def test_reset_rejects_non_parquet_target(spark, tmp_path):
    from gnarly_spark.sinks.lake import ParquetLakeTable

    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        target=_ModelessTarget(
            ParquetLakeTable(spark, str(tmp_path / "work" / "pages"), key="url")
        ),
    )
    with pytest.raises(TypeError, match="ParquetLakeTable"):
        p.reset()


def test_dedup_minhash_rejects_non_divisible_bands(spark, tmp_path):
    """k % bands != 0 silently drops trailing minhash positions from
    banding — the pipeline must reject it at construction."""
    with pytest.raises(ValueError, match="divisible"):
        CdcIngestPipeline(
            spark, str(tmp_path / "work"), dedup_minhash={"k": 10, "bands": 4}
        )


def test_retain_log_off_rereads_only_retained_files(spark, tmp_path, monkeypatch):
    """The retain_log=False adjudication re-read must scan the retained
    batches' FILES, not the whole source dir: a full-dir read is
    O(delivered history) per trigger (quadratic over a long drain). With a
    small retention window, later triggers must read strictly fewer files
    than the dir holds — while the final state still equals the replay."""
    seen: list = []
    orig = CdcIngestPipeline._read_source

    def spy(self, files=None):
        seen.append(files)
        return orig(self, files)

    monkeypatch.setattr(CdcIngestPipeline, "_read_source", spy)

    log = gen_changelog(n_blocks=30, events_per_block=5, fork_depth=2, seed=13)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=10)
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), retention_blocks=4, retain_log=False
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))

    assert len(seen) == 10  # one adjudication read per trigger
    # every read was file-bounded (inputFiles() resolved on each trigger)
    assert all(files is not None and len(files) >= 1 for files in seen)
    # once retention pruning kicks in, the read covers a strict subset of
    # the 10 delivered files — the O(window) bound this fix exists for
    assert len(seen[-1]) < 10
    # and the recorded per-batch metadata carries the file lists
    assert all(r.get("files") for r in p._seq_ranges())


def test_retain_log_off_handles_spaced_file_names(spark, tmp_path):
    """Checkpoint-log entries are URI-encoded (space -> %20): the bounded
    adjudication re-read must decode them (and glob-escape the result), or
    a changelog file named 'chunk 1.parquet' 404s the stream mid-drain."""
    import shutil

    log = gen_changelog(n_blocks=12, events_per_block=5, fork_depth=2, seed=17)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=4)
    # flatten each chunk's part file into the source root under a name
    # containing a space (rename preserves mtime, so delivery order holds;
    # the stream source lists them fine — only the re-read path ever sees
    # the %20-encoded form)
    for i, d in enumerate(sorted(os.listdir(src))):
        part = [f for f in os.listdir(os.path.join(src, d)) if f.startswith("part-")][0]
        shutil.move(
            os.path.join(src, d, part), os.path.join(src, f"events {i:02d}.parquet")
        )
        shutil.rmtree(os.path.join(src, d))
    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), retain_log=False, retention_blocks=4
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))
    # the re-read really was bounded: every retained range recorded files,
    # and the decoded paths contain the literal space
    rng = p._seq_ranges()
    assert rng and all(r.get("files") for r in rng)
    assert all("events " in f for r in rng for f in r["files"])
    assert not any("%20" in f for r in rng for f in r["files"])


def test_retain_log_off_canonicalize_revert_rolls_back(spark, tmp_path):
    """retain_log=False re-reads the RAW source for revert adjudication;
    with canonicalize_urls=True the re-read must apply the same key
    normalization as batch entry, or the revert's delete keys on the raw
    spelling miss the canonically-keyed target row (silent rollback
    loss)."""
    from gnarly_spark.fixtures import CHANGELOG_COLUMNS, block_hash

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["op_seq", "block_id", "op", "url", "revert_of_block"]
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            pdf.op_seq, unit="s"
        )
        pdf["html"] = None
        pdf["lang"] = "en"
        pdf["reason"] = None
        return pdf[CHANGELOG_COLUMNS]

    src = str(tmp_path / "changelog")
    os.makedirs(src)
    b0 = mk([(1, 1, "insert", "https://x.com/?utm_source=mail", None),
             (2, 1, "insert", "https://y.com/", None)])
    b1 = mk([(3, 2, "insert", "https://z.com/", None),
             (4, 2, "revert", None, block_hash(1))])
    for i, pdf in enumerate((b0, b1)):
        spark.createDataFrame(pdf, schema=CHANGELOG_DDL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk={i:04d}"))
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        retain_log=False,
        canonicalize_urls=True,
        with_text=False,
    )
    run_stream(p, src)
    urls = {r.url for r in p.target.read().select("url").collect()}
    # block 1 reverted: BOTH its rows must be gone, keyed canonically
    assert urls == {"https://z.com/"}, urls


def test_retained_ranges_keep_null_max_block(spark, tmp_path):
    """A batch whose events all carry NULL block_id records max_block=None;
    the pruner keeps such ranges forever, so the bounded adjudication read
    must include their files too — dropping them would silently remove the
    batch's upserts from revert re-adjudication."""
    import json as _json

    p = CdcIngestPipeline(spark, str(tmp_path / "work"), retain_log=False,
                          retention_blocks=5)
    ranges = [
        {"batch_id": 0, "min_seq": 1, "max_seq": 10, "max_block": 1,
         "files": ["f0"]},                                   # beyond window
        {"batch_id": 1, "min_seq": 11, "max_seq": 20, "max_block": None,
         "files": ["f1"]},                                   # unprovable
        {"batch_id": 2, "min_seq": 21, "max_seq": 30, "max_block": 99,
         "files": ["f2"]},                                   # in window
    ]
    with open(p._ranges_path, "w") as f:
        _json.dump(ranges, f)
    kept = p._retained_ranges(batch_id=3, prev_high=100)
    assert [r["batch_id"] for r in kept] == [1, 2]
    # and a None min_seq in a kept range must not break the lo computation
    kept[0]["min_seq"] = None
    lo = min([r["min_seq"] for r in kept if r["min_seq"] is not None] + [0])
    assert lo == 0


def test_dedup_minhash_rejects_zero_bands(spark, tmp_path):
    with pytest.raises(ValueError, match="bands"):
        CdcIngestPipeline(
            spark, str(tmp_path / "work"), dedup_minhash={"k": 8, "bands": 0}
        )


def test_metrics_are_trigger_ordered(spark, tmp_path):
    """metrics() sorts by batch_id, not filename (batch-10 < batch-2
    lexicographically) — BENCH first/last-N slices depend on it."""
    import json as _json

    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    for b in (10, 2, 0, 11):
        with open(os.path.join(p.metrics_dir, f"batch-{b}.json"), "w") as f:
            _json.dump({"batch_id": b, "wall_s": float(b)}, f)
    assert [m["batch_id"] for m in p.metrics()] == [0, 2, 10, 11]


def test_metrics_lineage_covers_source_exactly_once(spark, tmp_path):
    """Every batch's metrics carry per-partition lineage: the trigger's
    source files (from the file-source WAL), the op_seq span, and the task
    count. Across the drain the file sets are DISJOINT and their union is
    exactly the changelog's files; seq spans are contiguous-ordered."""
    log = gen_changelog(n_blocks=16, events_per_block=4)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=4)
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    run_stream(p, src)
    lin = [m["lineage"] for m in p.metrics()]
    assert all(li["files"] for li in lin)
    assert all(li["n_partitions"] >= 1 for li in lin)
    seen: list[str] = []
    for li in lin:
        assert not (set(li["files"]) & set(seen)), "a file fed two batches"
        seen += li["files"]
    on_disk = {
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(src)
        for fn in fns
        if fn.endswith(".parquet")
    }
    # WAL paths are URIs (file:///...) — normalize to plain absolute paths
    assert {"/" + f.removeprefix("file:").lstrip("/") for f in seen} == on_disk
    spans = [(li["min_seq"], li["max_seq"]) for li in lin]
    assert spans == sorted(spans) and all(a <= b for a, b in spans)
    # spans tile the changelog without overlap
    for (_, hi), (lo2, _) in zip(spans, spans[1:]):
        assert hi < lo2
    assert spans[0][0] == int(log.op_seq.min())
    assert spans[-1][1] == int(log.op_seq.max())


def test_canonicalize_urls_collapses_messy_spellings(spark, tmp_path):
    """The same page arriving as ?utm_*, UPPERCASE scheme/host, and
    trailing-slash spellings merges into ONE canonical row — final state
    equals the clean changelog's oracle. With the option off, the messy
    feed mints phantom pages (the failure mode the option exists for)."""
    log = gen_changelog(n_blocks=12, events_per_block=5)
    messy = log.copy()

    def _mess(row):
        u, k = row["url"], row["op_seq"] % 4
        if k == 0:
            return u
        if k == 1:
            return u.replace("https://", "HTTPS://", 1) + "/"
        if k == 2:
            return u + "?utm_source=feed&utm_campaign=x"
        return u + "#frag"

    messy["url"] = messy.apply(_mess, axis=1)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, messy, src, n_files=4)

    p = CdcIngestPipeline(
        spark, str(tmp_path / "work"), canonicalize_urls=True
    )
    run_stream(p, src)
    assert_pdf_equal(_got(p), _want(log))

    p_off = CdcIngestPipeline(spark, str(tmp_path / "work_off"))
    run_stream(p_off, src)
    assert len(_got(p_off)) > len(_want(log))


def test_datagen_reverts_target_only_real_blocks(spark):
    """When revert_every_blocks divides n_blocks the generator used to emit
    a phantom revert of a block with no events, carried by a block id past
    the chain head — inflating the pipeline's block watermark by 2."""
    from gnarly_spark.datagen import gen_changelog_spark

    log = gen_changelog_spark(
        spark, n_events=1000, events_per_block=100, revert_every_blocks=5
    )  # n_blocks=10 divisible by 5: k=2 would target rb=10 (nonexistent)
    ev_blocks = {
        r.block_hash
        for r in log.where(F.col("op") != "revert").select("block_hash").distinct().collect()
    }
    revs = log.where(F.col("op") == "revert").collect()
    assert revs, "expected at least one revert"
    assert all(r.revert_of_block in ev_blocks for r in revs)
    assert all(r.block_hash in ev_blocks for r in revs)  # emitted from a real block


def test_chain_builder_fork_parent_lineage_is_continuous(spark):
    """Every non-genesis parent_hash names a block that was actually
    emitted — depth>=2 forks used to chain fork blocks to canonical-hash
    parents that never existed."""
    from gnarly_spark.fixtures import ChainBuilder

    cb = ChainBuilder(seed=5)
    for _ in range(3):
        cb.add_block()
    cb.fork(depth=3)
    cb.add_block()
    pdf = cb.to_pandas()
    emitted = set(pdf.block_hash)
    parents = set(pdf.parent_hash) - {"genesis"}
    assert parents <= emitted, parents - emitted


def test_pipeline_ingest_into_branch_then_publish(spark, tmp_path):
    """The REAL streaming pipeline drains into a BRANCH handle of the
    target table (zero pipeline changes — the branch ref is just the
    handle's commit destination): main provably serves the fork state for
    the whole drain, fast_forward publishes the audited chain, the final
    main state equals one-shot replay, and the published batch_ids make a
    main-side refire a no-op."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    log = gen_changelog(n_blocks=16, events_per_block=5, fork_depth=3, seed=7)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=4)

    main = ParquetLakeTable(spark, str(tmp_path / "pages"), key="url")
    branch = main.create_branch("ingest")
    fork_v = main.current_version()

    p = CdcIngestPipeline(spark, str(tmp_path / "work"), target=branch)
    run_stream(p, src)
    assert len(p.metrics()) >= 2  # really went through micro-batches
    # main never moved while the branch ingested
    assert main.current_version() == fork_v
    assert main.read().count() == 0 if fork_v < 0 else True
    published = main.fast_forward("ingest")
    assert main.current_version() == published
    got = (
        main.read()
        .select(*PAGE_COLS)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(got, _want(log))
    # the branch's applied batches are durable on main after publish
    applied = main.applied_batch_ids()
    assert applied and applied == branch.applied_batch_ids()
