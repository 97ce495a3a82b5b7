"""Batch replay vs pure-pandas oracle — ports the reference's core
invariants (SURVEY.md §5): rollback∘apply = identity, replay(log) = state,
fork-of-depth-k fully undone (Ourbit.spec.ts:155-179,
Blockstream.spec.ts:249-277)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gnarly_spark.fixtures import gen_changelog, oracle_final_state
from gnarly_spark.operators.replay import (
    final_state,
    last_writer_wins,
    last_writer_wins_window,
    live_events,
)
from tests.conftest import assert_pdf_equal


def _spark_final(to_spark, pdf, with_text=True):
    return final_state(to_spark(pdf), with_text=with_text).toPandas()


def test_linear_chain_matches_oracle(to_spark):
    log = gen_changelog(n_blocks=20, events_per_block=5)
    got = _spark_final(to_spark, log)
    want = oracle_final_state(log)
    assert len(want) > 0
    assert_pdf_equal(got, want, sort_by=["url"])


def test_fork_reverted_matches_oracle(to_spark):
    log = gen_changelog(n_blocks=20, events_per_block=5, fork_depth=3)
    got = _spark_final(to_spark, log)
    want = oracle_final_state(log)
    assert_pdf_equal(got, want, sort_by=["url"])


def test_fork_effects_fully_undone(to_spark):
    """Final state with a reverted fork == final state of a chain that
    never contained the fork's events (Blockstream.spec.ts:249-277)."""
    forked = gen_changelog(n_blocks=15, events_per_block=4, fork_depth=2, seed=7)
    reverted = set(forked.loc[forked.op == "revert", "revert_of_block"])
    clean = forked[(forked.op != "revert") & (~forked.block_hash.isin(reverted))]
    got_forked = _spark_final(to_spark, forked)
    got_clean = _spark_final(to_spark, clean)
    assert_pdf_equal(got_forked, got_clean, sort_by=["url"])


def test_delete_wins_url_absent(to_spark):
    log = gen_changelog(n_blocks=30, events_per_block=6, seed=3)
    want = oracle_final_state(log)
    deleted_last = (
        log[log.op != "revert"]
        .sort_values(["warc_ts", "op_seq"])
        .groupby("url")
        .tail(1)
    )
    deleted_urls = set(deleted_last.loc[deleted_last.op == "delete", "url"])
    assert deleted_urls, "fixture must contain a url whose last event is delete"
    got = _spark_final(to_spark, log)
    assert not (set(got.url) & deleted_urls)
    assert_pdf_equal(got, want, sort_by=["url"])


def test_lww_tie_break_on_op_seq(to_spark):
    """Events sharing warc_ts resolve by op_seq (contract: (warc_ts, op_seq))."""
    log = gen_changelog(n_blocks=5, events_per_block=8, n_urls=4, seed=11)
    dup_ts = log[log.op != "revert"].groupby(["url", "warc_ts"]).size()
    assert (dup_ts > 1).any(), "fixture must contain same-url same-ts events"
    got = _spark_final(to_spark, log)
    want = oracle_final_state(log)
    assert_pdf_equal(got, want, sort_by=["url"])


def test_window_variant_agrees_with_max_by(to_spark):
    log = gen_changelog(n_blocks=12, events_per_block=6, fork_depth=2, seed=5)
    ev = live_events(to_spark(log))
    a = last_writer_wins(ev).toPandas().sort_values("url").reset_index(drop=True)
    b = (
        last_writer_wins_window(ev)
        .select(*a.columns)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert_pdf_equal(a, b)


def test_zipf_skewed_fixture(to_spark):
    """Hot-key fixture (FIXTURES.md F7): skew must not change semantics."""
    log = gen_changelog(n_blocks=20, events_per_block=10, zipf_s=1.2, seed=9)
    counts = log[log.op != "revert"].url.value_counts(normalize=True)
    assert counts.iloc[0] > 0.08, "top url should be hot"
    got = _spark_final(to_spark, log)
    want = oracle_final_state(log)
    assert_pdf_equal(got, want, sort_by=["url"])


def test_replay_is_idempotent_under_duplicate_events(to_spark):
    """Re-delivered (at-least-once) events do not change the final state —
    the property that makes the streaming MERGE idempotent."""
    log = gen_changelog(n_blocks=10, events_per_block=5, seed=13)
    dup = pd.concat([log, log.iloc[: len(log) // 2]], ignore_index=True)
    assert_pdf_equal(
        _spark_final(to_spark, dup), _spark_final(to_spark, log), sort_by=["url"]
    )


def test_scd2_history_intervals(to_spark):
    """SCD2 invariants: per-url intervals chain (valid_to of version i ==
    valid_from of version i+1 unless a delete closed it), exactly one open
    interval per live url, deleted urls end closed, reverted-block events
    never appear as versions."""
    from gnarly_spark.operators.replay import live_events, scd2_history

    log = gen_changelog(n_blocks=20, events_per_block=6, fork_depth=3, seed=21)
    hist = scd2_history(live_events(to_spark(log))).toPandas()

    # versions = exactly the live non-delete events
    reverted = set(log.loc[log.op == "revert", "revert_of_block"])
    live = log[(log.op != "revert") & (~log.block_hash.isin(reverted))]
    assert set(hist.version_seq) == set(live.loc[live.op != "delete", "op_seq"])

    final = oracle_final_state(log)
    open_per_url = hist[hist.is_current == 1].groupby("url").size()
    # current versions == exactly the urls present in the final state
    assert set(open_per_url.index) == set(final.url)
    assert (open_per_url == 1).all()

    # interval chaining: each non-final version's valid_to equals the next
    # live event's timestamp for that url
    for url, g in hist.sort_values(["url", "valid_from_ts", "version_seq"]).groupby("url"):
        ts = list(g.valid_from_ts) + [None]
        for i, (_, row) in enumerate(g.iterrows()):
            nxt = ts[i + 1]
            if row.valid_to_ts is not None and nxt is not None:
                # closed by the next version (update) — must chain exactly;
                # closed by a delete has no successor row
                assert row.valid_to_ts <= nxt or pd.isna(nxt)


def test_lww_fetch_variant_agrees(spark, to_spark):
    """last_writer_wins_fetch (narrow reduce + broadcast semi-join) must
    produce exactly the winner set of the max_by partial-agg path, and
    final_state(strategy='fetch') must equal the default replay."""
    from gnarly_spark.fixtures import gen_changelog
    from gnarly_spark.operators.replay import (
        final_state,
        last_writer_wins,
        last_writer_wins_fetch,
        live_events,
    )

    log = to_spark(gen_changelog(n_blocks=30, events_per_block=6, seed=17, fork_depth=3))
    a = last_writer_wins(live_events(log)).orderBy("url").toPandas()
    b = last_writer_wins_fetch(live_events(log)).orderBy("url").toPandas()
    assert_pdf_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    fa = final_state(log).orderBy("url").toPandas()
    fb = final_state(log, strategy="fetch").orderBy("url").toPandas()
    assert_pdf_equal(fa, fb)


def test_lww_fetch_keeps_null_warc_ts_winner(spark):
    """strategy='fetch' must agree with 'maxby' when a key's winning row
    has NULL warc_ts — the equi-join's NULL semantics used to drop the key
    entirely (eqNullSafe fix)."""
    from gnarly_spark.operators.replay import last_writer_wins, last_writer_wins_fetch

    rows = [
        ("u1", None, 5, "keep-me"),
        ("u2", "2024-01-01 00:00:01", 1, "normal"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, op_seq long, v string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    a = {(r.url, r.v) for r in last_writer_wins(df).collect()}
    b = {(r.url, r.v) for r in last_writer_wins_fetch(df).collect()}
    assert a == b == {("u1", "keep-me"), ("u2", "normal")}
