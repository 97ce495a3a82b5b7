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
@given(data=st.data())
def test_lake_modes_match_dict_model_property(spark, tmp_path_factory, data):
    """For ARBITRARY merge/delete/compact/refire sequences — including
    mid-sequence type widening (int -> bigint values) and column adds —
    a COW table, a MOR table, and a plain python dict must agree on the
    final state; refired batch_ids must be no-ops on both."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    keys = [f"k{i}" for i in range(8)]
    n_ops = data.draw(st.integers(2, 5), label="n_ops")
    work = str(tmp_path_factory.mktemp("lakeprop"))
    cow = ParquetLakeTable(spark, work + "/cow", key="url", n_buckets=4)
    mor = ParquetLakeTable(spark, work + "/mor", key="url", n_buckets=4, mode="mor")
    model: dict[str, tuple] = {}
    has_schema = False
    for batch_id in range(n_ops):
        ups = data.draw(
            st.lists(
                st.tuples(
                    st.sampled_from(keys),
                    st.one_of(st.integers(0, 100), st.integers(2**35, 2**40)),
                    st.sampled_from(["en", "de", None]),
                ),
                min_size=0,
                max_size=5,
                unique_by=lambda t: t[0],
            ),
            label="upserts",
        )
        dels = data.draw(
            st.lists(st.sampled_from(keys), min_size=0, max_size=3, unique=True),
            label="deletes",
        )
        wide = data.draw(st.booleans(), label="wide_schema")
        # batches of small values write v as int; a later big-value batch
        # widens the column to bigint mid-sequence
        vtype = "bigint" if any(v >= 2**31 for _, v, _ in ups) else "int"
        schema = f"url string, v {vtype}" + (", lang string" if wide else "")
        up_rows = [(k, v, lang)[: 3 if wide else 2] for k, v, lang in ups]
        # a delete-only batch on a schema-less table is a no-commit no-op
        expect_commit = bool(up_rows) or (bool(dels) and has_schema)
        for t in (cow, mor):
            up_df = spark.createDataFrame(up_rows, schema=schema) if up_rows else None
            dk_df = (
                spark.createDataFrame([(k,) for k in dels], "url string")
                if dels
                else None
            )
            assert t.merge(up_df, delete_keys=dk_df, batch_id=batch_id) == expect_commit
            if expect_commit:  # refire must be a committed-batch no-op
                v_before = t.current_version()
                assert t.merge(up_df, delete_keys=dk_df, batch_id=batch_id) is False
                assert t.current_version() == v_before
        has_schema = has_schema or bool(up_rows)
        # model: upsert wins over a same-batch delete (documented contract)
        for k in dels:
            model.pop(k, None)
        for k, v, lang in ups:
            model[k] = (v, lang if wide else None)
        if data.draw(st.booleans(), label="compact"):
            mor.compact()
        # a z-order rewrite is content-invariant: any table may be
        # clustered at any point without changing the final state
        if has_schema:
            which = data.draw(
                st.sampled_from(["none", "cow", "mor"]), label="cluster"
            )
            if which != "none":
                (cow if which == "cow" else mor).cluster(by=["v"], bits=4)
    for t in (cow, mor):
        got = {
            r.url: (r.v, getattr(r, "lang", None)) for r in t.read().collect()
        }
        assert got == model, f"{t.mode} diverged from model"


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


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_lake_maintenance_history_model_property(spark, tmp_path_factory, data):
    """History model: for ARBITRARY interleavings of merge, compact,
    rebucket, cluster, restore, purge_keys and expire_snapshots, EVERY
    retained snapshot (time travel read at each version, not just HEAD)
    must match a driver-side dict-of-dicts model of history. Covers the
    interactions directed tests can't enumerate — purge after a rebucket
    changed the layout mid-history (the round-2 advisor's high-severity
    class), restore of an already-purged snapshot, expire shrinking the
    purge's rewrite set, cluster/compact preserving historical reads."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    keys = [f"k{i}" for i in range(8)]
    mode = data.draw(st.sampled_from(["cow", "mor"]), label="mode")
    n_steps = data.draw(st.integers(3, 5), label="n_steps")
    work = str(tmp_path_factory.mktemp("lakehist"))
    t = ParquetLakeTable(spark, work + "/t", key="url", n_buckets=4, mode=mode)

    state: dict[str, int] = {}          # expected HEAD content
    history: dict[int, dict[str, int]] = {}  # version -> expected content

    def resync(prev: int) -> None:
        """Record a snapshot for any new committed version (ops decide
        commit-vs-noop internally — MOR tombstone rows make 'did purge
        commit' unpredictable from resolved content alone, so observe)."""
        cur = t.current_version()
        assert cur in (prev, prev + 1), f"one op committed {prev}->{cur}"
        if cur != prev:
            history[cur] = dict(state)

    for step in range(n_steps):
        ups = data.draw(
            st.lists(
                st.tuples(st.sampled_from(keys), st.integers(0, 100)),
                min_size=0, max_size=5, unique_by=lambda u: u[0],
            ),
            label="upserts",
        )
        dels = data.draw(
            st.lists(st.sampled_from(keys), min_size=0, max_size=2, unique=True),
            label="deletes",
        )
        if ups or dels:
            prev = t.current_version()
            t.merge(
                spark.createDataFrame(ups, "url string, v int") if ups else None,
                delete_keys=(
                    spark.createDataFrame([(k,) for k in dels], "url string")
                    if dels else None
                ),
                batch_id=step,
            )
            for k in dels:      # upsert wins over same-batch delete
                state.pop(k, None)
            for k, v in ups:
                state[k] = v
            resync(prev)

        op = data.draw(
            st.sampled_from(["none", "compact", "rebucket", "cluster",
                             "restore", "purge"]),
            label="maintenance",
        )
        prev = t.current_version()
        if op == "compact":
            t.compact()
        elif op == "rebucket" and prev >= 0:
            t.rebucket(data.draw(st.sampled_from([2, 3, 5, 8]), label="nb"))
        elif op == "cluster" and state:
            t.cluster(by=["v"], bits=4)
        elif op == "restore" and history:
            target = data.draw(
                st.sampled_from(sorted(history)), label="restore_to"
            )
            t.restore(target)
            state = dict(history[target])
        elif op == "purge" and history:
            victims = data.draw(
                st.lists(st.sampled_from(keys), min_size=1, max_size=2,
                         unique=True),
                label="purge_keys",
            )
            t.purge_keys(*victims)
            for snap in history.values():
                for k in victims:
                    snap.pop(k, None)
            for k in victims:
                state.pop(k, None)
        resync(prev)

        if data.draw(st.booleans(), label="expire"):
            kept = t.expire_snapshots(
                keep_last=data.draw(st.integers(2, 4), label="keep_last")
            )["kept"]
            history = {v: s for v, s in history.items() if v in set(kept)}

    for v in sorted(history):
        got = {r.url: r.v for r in t.read(v).collect()}
        assert got == history[v], f"v{v} ({mode}) diverged from model"
