"""Data-quality expectations + the write-audit-publish gate.

The expectations layer replaces the reference's unconditional store writes
(typeStore/Sequelize.ts:28-191 applies every op with no audit step) with a
declared-invariant gate between "merge computed" and "readers see it"."""

from __future__ import annotations

import json
import os

import pytest

from gnarly_spark.quality import (
    Expectation,
    QualityGateError,
    UniqueKey,
    evaluate_expectations,
    gate_and_publish,
)
from gnarly_spark.sinks.lake import ParquetLakeTable


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "hello world", "en"),
            (2, "bonjour", "fr"),
            (3, None, "en"),
            (3, "dup id", "xx"),
            (None, "no id", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )


def test_evaluate_expectations_counts_and_null_predicates(spark):
    rep = {
        r["check_name"]: r.asDict()
        for r in evaluate_expectations(
            _docs(spark),
            [
                Expectation("id_not_null", "doc_id IS NOT NULL"),
                UniqueKey("id_unique", "doc_id"),
                # length(NULL) is NULL -> the NULL-text row must count as a
                # violation (FALSE and NULL both fail)
                Expectation("text_min_5", "length(text) >= 5"),
                Expectation(
                    "lang_known",
                    "lang IN ('en','fr')",
                    max_violation_fraction=0.25,
                ),
            ],
        ).collect()
    }
    assert rep["id_not_null"] == {
        "check_name": "id_not_null", "violations": 1, "total": 5, "passed": False,
    }
    assert rep["id_unique"]["violations"] == 1  # doc_id 3 twice (NULL excluded)
    assert rep["text_min_5"]["violations"] == 1  # NULL text (NULL pred fails)
    # 1 violation out of 5 = 0.2 <= 0.25 budget -> passes
    assert rep["lang_known"] == {
        "check_name": "lang_known", "violations": 1, "total": 5, "passed": True,
    }


def test_evaluate_expectations_single_scan_plan(spark):
    """N checks must ride ONE pass: the physical plan reads the relation
    once (no self-joins / repeated subtrees per check)."""
    df = _docs(spark).localCheckpoint()
    rep = evaluate_expectations(
        df,
        [
            Expectation("a", "doc_id IS NOT NULL"),
            Expectation("b", "length(text) >= 5"),
            Expectation("c", "lang = 'en'"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan
    assert "partial_sum" in plan  # checks combine map-side before the shuffle


def test_evaluate_expectations_rejects_bad_input(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="no checks"):
        evaluate_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate check name"):
        evaluate_expectations(
            df, [Expectation("x", "1=1"), Expectation("x", "2=2")]
        )
    with pytest.raises(ValueError, match="mode"):
        Expectation("x", "1=1", mode="ignore")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v int")


def test_gate_publishes_when_checks_pass(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="k")
    t.merge(_mk(spark, [("a", 1)]), batch_id=0)
    tok = t.merge_staged(_mk(spark, [("b", 2)]), batch_id=1)
    report = gate_and_publish(
        t, tok, [Expectation("v_positive", "v > 0"), UniqueKey("k_unique", "k")]
    )
    assert all(r["passed"] for r in report)
    assert sorted(r.k for r in t.read().collect()) == ["a", "b"]
    assert t.applied_batch_ids() == {0, 1}


def test_gate_failure_parks_stage_and_blocks_publish(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="k")
    t.merge(_mk(spark, [("a", 1)]), batch_id=0)
    tok = t.merge_staged(_mk(spark, [("b", -5)]), batch_id=1)
    with pytest.raises(QualityGateError) as ei:
        gate_and_publish(
            t,
            tok,
            [
                Expectation("v_positive", "v > 0"),
                Expectation("k_nonempty", "length(k) > 0", mode="warn"),
            ],
        )
    # readers unaffected, batch not durably applied, stage still parked
    assert [r.k for r in t.read().collect()] == ["a"]
    assert t.applied_batch_ids() == {0}
    assert ei.value.failed[0]["check_name"] == "v_positive"
    assert {r["check_name"] for r in ei.value.report} == {"v_positive", "k_nonempty"}
    # forensics: the audited state is still reproducible, then publishable
    # after a manual override
    assert sorted(r.k for r in t.read_staged(tok).collect()) == ["a", "b"]
    t.publish_staged(tok)
    assert t.applied_batch_ids() == {0, 1}


def test_gate_warn_mode_never_blocks(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="k")
    tok = t.merge_staged(_mk(spark, [("a", -1)]), batch_id=0)
    report = gate_and_publish(t, tok, [Expectation("v_pos", "v > 0", mode="warn")])
    assert report == [
        {"check_name": "v_pos", "violations": 1, "total": 1, "passed": False,
         "mode": "warn"}
    ]
    assert t.applied_batch_ids() == {0}


def test_gate_abandon_on_fail_frees_batch(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="k")
    tok = t.merge_staged(_mk(spark, [("a", -1)]), batch_id=0)
    with pytest.raises(QualityGateError):
        gate_and_publish(
            t, tok, [Expectation("v_pos", "v > 0")], abandon_on_fail=True
        )
    with pytest.raises(FileNotFoundError):
        t.read_staged(tok)
    # the fixed batch can be redelivered under the same batch_id
    assert t.merge(_mk(spark, [("a", 1)]), batch_id=0)
    assert [r.v for r in t.read().collect()] == [1]


# ---- streaming pipeline integration ---------------------------------------


def test_pipeline_quality_gate_passes_and_records_metrics(spark, tmp_path):
    from gnarly_spark.fixtures import gen_changelog, oracle_final_state
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline
    from tests.conftest import assert_pdf_equal
    from tests.test_pipeline import PAGE_COLS, run_stream, write_changelog_files

    log = gen_changelog(n_blocks=12, events_per_block=5)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=3)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        quality_gate=[
            Expectation("url_not_null", "url IS NOT NULL"),
            UniqueKey("url_unique", "url"),
            Expectation("text_extracted", "text IS NOT NULL", mode="warn"),
        ],
    )
    run_stream(p, src)
    got = (
        p.pages().select(*PAGE_COLS).toPandas().sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(got, oracle_final_state(log)[PAGE_COLS].reset_index(drop=True))
    # every committed batch carries its audit report in the metrics
    reports = [m["quality"] for m in p.metrics() if "quality" in m]
    assert reports and all(
        {r["check_name"] for r in rep}
        == {"url_not_null", "url_unique", "text_extracted"}
        for rep in reports
    )


def test_pipeline_quality_gate_halts_stream_with_stage_parked(spark, tmp_path):
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline
    from tests.test_pipeline import run_stream, write_changelog_files

    log = gen_changelog(n_blocks=8, events_per_block=5)
    src = str(tmp_path / "changelog")
    write_changelog_files(spark, log, src, n_files=2)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        quality_gate=[Expectation("impossible", "1 = 0")],
    )
    with pytest.raises(Exception, match="quality gate failed: impossible"):
        run_stream(p, src)
    # nothing published; the failed batch's stage is parked for forensics
    assert p.target.applied_batch_ids() == set()
    staged = os.listdir(os.path.join(p.target.path, "_staged"))
    assert len(staged) == 1
    tok = staged[0][: -len(".json")]
    assert p.target.read_staged(tok).count() > 0


def test_gate_failure_rolls_back_dedup_state_for_redelivery(spark, tmp_path):
    """A gate-failed batch is abandoned, FIXED, and redelivered with
    different rows — the dedup signature corpus and flags computed from
    the rejected rows must not survive, or the redelivered batch would
    no-op on the sig batch-id guard and the corpus would diverge from the
    published table forever."""
    import pandas as pd

    from gnarly_spark.fixtures import (
        CHANGELOG_COLUMNS,
        CHANGELOG_DDL,
        block_hash,
        html_for,
    )
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["op_seq", "block_id", "op", "url", "html", "lang"]
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            pdf.op_seq, unit="s"
        )
        pdf["revert_of_block"] = None
        pdf["reason"] = None
        return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)

    ha, hb = html_for("https://a", 1), html_for("https://b", 2)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        dedup_minhash={"min_est_jaccard": 0.5},
        quality_gate=[Expectation("lang_known", "lang IS NULL OR lang != 'xx'")],
    )
    p.process_batch(
        mk([(1, 0, "insert", "https://a", ha, "en"),
            (2, 0, "insert", "https://b", hb, "en")]), 0)
    sig_v = p.sig_table.current_version()

    # batch 1 (bad): c duplicates a, and a row violates the gate
    with pytest.raises(QualityGateError):
        p.process_batch(mk([(3, 1, "insert", "https://c", ha, "xx")]), 1)
    # the rollback is DEFERRED: the sig merge stays durable with a parked
    # quarantine marker, because the operator may still publish_staged the
    # exact rows it was computed from (see the publish-override test)
    assert 1 in p.sig_table.applied_batch_ids()
    assert os.path.exists(
        os.path.join(p.work_dir, "_quarantine", "batch=1.json")
    )
    # target stage parked; abandon to free the batch id (the operator flow)
    staged = os.listdir(os.path.join(p.target.path, "_staged"))
    p.target.abandon_staged(staged[0][: -len(".json")])

    # redelivered batch 1 (fixed): c now duplicates B, lang corrected.
    # The refire settles the quarantine first — target doesn't have batch
    # 1, so the rejected rows' sigs/flags roll back and are recomputed.
    p.process_batch(mk([(3, 1, "insert", "https://c", hb, "en")]), 1)
    assert not os.path.exists(
        os.path.join(p.work_dir, "_quarantine", "batch=1.json")
    )
    flags = {(r.url, r.dup_of) for r in p.dup_flags().collect()}
    assert flags == {("https://c", "https://b")}, flags
    assert 1 in p.sig_table.applied_batch_ids()
    assert p.sig_table.current_version() > sig_v
    assert sorted(r.url for r in p.target.read().collect()) == [
        "https://a", "https://b", "https://c",
    ]


def test_gate_failure_publish_override_keeps_dedup_state(spark, tmp_path):
    """The OTHER resolution of a parked gate failure: the operator
    publish_staged()s the quarantined batch (manual override). The batch's
    signatures and flags were computed from exactly those rows, so they
    must SURVIVE — an eager rollback at failure time would permanently
    blind later batches to duplicates of the published pages."""
    import pandas as pd

    from gnarly_spark.fixtures import (
        CHANGELOG_COLUMNS,
        CHANGELOG_DDL,
        block_hash,
        html_for,
    )
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["op_seq", "block_id", "op", "url", "html", "lang"]
        )
        pdf["block_hash"] = pdf.block_id.map(block_hash)
        pdf["parent_hash"] = (pdf.block_id - 1).map(block_hash)
        pdf["warc_ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            pdf.op_seq, unit="s"
        )
        pdf["revert_of_block"] = None
        pdf["reason"] = None
        return spark.createDataFrame(pdf[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL)

    ha, hb = html_for("https://a", 1), html_for("https://b", 2)
    # ratio gate: the audit runs over the whole staged table, so an
    # overridden violating row stays in later audits — a fractional budget
    # is the realistic override shape (fails at 1/2 'xx', passes at 1/3)
    p = CdcIngestPipeline(
        spark,
        str(tmp_path / "work"),
        dedup_minhash={"min_est_jaccard": 0.5},
        quality_gate=[
            Expectation(
                "lang_known",
                "lang IS NULL OR lang != 'xx'",
                max_violation_fraction=0.4,
            )
        ],
    )
    p.process_batch(mk([(1, 0, "insert", "https://a", ha, "en")]), 0)

    # batch 1: c duplicates a, and the batch violates the gate
    bad = mk([(2, 1, "insert", "https://c", ha, "xx")])
    with pytest.raises(QualityGateError):
        p.process_batch(bad, 1)
    assert os.path.exists(os.path.join(p.work_dir, "_quarantine", "batch=1.json"))

    # manual override: ship the audited rows exactly as staged
    staged = os.listdir(os.path.join(p.target.path, "_staged"))
    p.target.publish_staged(staged[0][: -len(".json")])

    # stream restart refires batch 1 — the refire settles the quarantine
    # (target has the batch: keep sigs/flags) and no-ops on the guard
    p.process_batch(bad, 1)
    assert not os.path.exists(
        os.path.join(p.work_dir, "_quarantine", "batch=1.json")
    )
    assert 1 in p.sig_table.applied_batch_ids()
    flags = {(r.url, r.dup_of) for r in p.dup_flags().collect()}
    assert flags == {("https://c", "https://a")}, flags

    # the published page's signature is LIVE in the corpus: a later batch
    # duplicating c's content gets flagged (the original bug silently
    # missed every such dup forever)
    p.process_batch(mk([(3, 2, "insert", "https://d", ha, "en")]), 2)
    flags = {(r.url, r.dup_of) for r in p.dup_flags().collect()}
    assert ("https://d", "https://c") in flags or ("https://d", "https://a") in flags


def test_pipeline_quality_gate_requires_stageable_target(spark, tmp_path):
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    class NoStage:
        pass

    with pytest.raises(ValueError, match="staged commits"):
        CdcIngestPipeline(
            spark,
            str(tmp_path / "work"),
            target=NoStage(),
            quality_gate=[Expectation("x", "1=1")],
        )


def test_check_names_with_backslashes_survive(spark):
    """Spark SQL string literals treat backslash as an escape — a name
    like r'col\time' used to come back with a TAB and crash the by-name
    report lookup in gate_and_publish."""
    df = _mk(spark, [("a", 1)])
    name = r"col\time not null"
    rows = evaluate_expectations(df, [Expectation(name, "v IS NOT NULL")]).collect()
    assert rows[0]["check_name"] == name


def test_unique_key_rejects_bad_mode():
    with pytest.raises(ValueError, match="mode"):
        UniqueKey(name="pk", column="url", mode="Fail")
