"""Property-based replay equivalence: for arbitrary seeded chains with
arbitrary fork depths and event mixes, Spark replay == pandas oracle, and
incremental batch processing == one-shot replay. (hypothesis drives the
fixture parameters; each example is a full Spark round-trip, so examples
are few but the space covers fork depth x chain length x skew x batch
splits.)"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog, oracle_final_state
from gnarly_spark.operators.replay import final_state
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal

PAGE_COLS = ["url", "warc_ts", "text", "lang"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    n_blocks=st.integers(4, 25),
    events_per_block=st.integers(1, 8),
    fork_depth=st.integers(0, 3),
    zipf=st.sampled_from([None, 1.1, 1.5]),
)
def test_replay_equals_oracle_property(
    spark, to_spark, seed, n_blocks, events_per_block, fork_depth, zipf
):
    if fork_depth >= n_blocks:
        fork_depth = 0
    log = gen_changelog(
        n_blocks=n_blocks,
        events_per_block=events_per_block,
        seed=seed,
        fork_depth=fork_depth,
        zipf_s=zipf,
    )
    got = (
        final_state(to_spark(log))
        .select(*PAGE_COLS)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = oracle_final_state(log)[PAGE_COLS].reset_index(drop=True)
    assert_pdf_equal(got, want)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    n_batches=st.integers(1, 6),
    fork_depth=st.integers(0, 3),
)
def test_incremental_equals_replay_property(spark, tmp_path_factory, seed, n_batches, fork_depth):
    log = gen_changelog(n_blocks=12, events_per_block=4, seed=seed, fork_depth=fork_depth)
    work = str(tmp_path_factory.mktemp(f"prop{seed}_{n_batches}_{fork_depth}"))
    p = CdcIngestPipeline(spark, work)
    chunk = (len(log) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            p.process_batch(spark.createDataFrame(part, schema=CHANGELOG_DDL), i)
    got = (
        p.pages().select(*PAGE_COLS).toPandas().sort_values("url").reset_index(drop=True)
    )
    want = oracle_final_state(log)[PAGE_COLS].reset_index(drop=True)
    assert_pdf_equal(got, want)
