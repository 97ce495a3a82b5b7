"""applyInPandasWithState head tracker: keyed streaming state folds across
micro-batches with the engine's (warc_ts, op_seq) ordering."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from gnarly_spark.fixtures import CHANGELOG_DDL, gen_changelog
from gnarly_spark.streaming.stateful import head_tracker


@pytest.fixture()
def changelog_dir(spark, to_spark, tmp_path):
    log = gen_changelog(n_blocks=12, events_per_block=6, seed=9)
    sdf = to_spark(log)
    d = tmp_path / "changelog"
    d.mkdir()
    for i, (lo, hi) in enumerate([(0, 6), (6, 12)]):
        stage = tmp_path / f"stage{i}"
        sdf.where((sdf.block_id >= lo) & (sdf.block_id < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        shutil.copy(glob.glob(f"{stage}/*.parquet")[0], d / f"part-{i}.parquet")
    return str(d), log


def test_head_tracker_state_across_batches(spark, changelog_dir, tmp_path):
    d, log = changelog_dir
    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = tmp_path / "out"
    q = (
        head_tracker(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")  # parquet sink: update rows append per trigger
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(out))
    # final head per url = last emitted row (highest last_seq wins)
    final = (
        got.groupBy("url")
        .agg(F.max_by(F.struct("n_events", "last_seq"), "last_seq").alias("w"))
        .select("url", "w.n_events", "w.last_seq")
        .toPandas()
        .set_index("url")
    )
    events = log[log.op != "revert"].dropna(subset=["url"])
    want_counts = events.groupby("url").size()
    want_head = events.sort_values(["warc_ts", "op_seq"]).groupby("url").op_seq.last()
    for url, n in want_counts.items():
        assert final.loc[url, "n_events"] == n, url
        assert final.loc[url, "last_seq"] == want_head[url], url


_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture()
def rocksdb_state(spark):
    """transformWithState supports only the RocksDB state store; scope the
    provider flip to the test (other suites keep the HDFS default)."""
    pytest.importorskip("google.protobuf")  # TWS state client needs protobuf
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_head_tracker_v2_transform_with_state_matches_v1(
    spark, changelog_dir, tmp_path, rocksdb_state
):
    """head_tracker_v2 (transformWithStateInPandas + RocksDB ValueState):
    state folds across micro-batches and the final per-url heads equal the
    applyInPandasWithState path's."""
    from gnarly_spark.streaming.stateful import head_tracker_v2

    d, log = changelog_dir
    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = tmp_path / "out2"
    q = (
        head_tracker_v2(stream, output_mode="append")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = (
        spark.read.parquet(str(out))
        .groupBy("url")
        .agg(F.max_by(F.struct("n_events", "last_seq"), "last_seq").alias("w"))
        .select("url", "w.n_events", "w.last_seq")
        .toPandas()
        .set_index("url")
    )
    events = log[log.op != "revert"].dropna(subset=["url"])
    want_counts = events.groupby("url").size()
    want_head = events.sort_values(["warc_ts", "op_seq"]).groupby("url").op_seq.last()
    assert len(final) == len(want_counts)
    for url, n in want_counts.items():
        assert final.loc[url, "n_events"] == n, url
        assert final.loc[url, "last_seq"] == want_head[url], url


def test_head_tracker_v2_ttl_evicts_idle_state(spark, tmp_path, rocksdb_state):
    """ttl_ms: a url idle past the TTL loses its ValueState — the second
    sighting restarts the fold (n_events=1) instead of continuing it. This
    is the state-bounding knob for an unbounded url universe."""
    import datetime as dt
    import time

    from gnarly_spark.streaming.stateful import head_tracker_v2

    src = tmp_path / "src"
    src.mkdir()

    def drop(name, seq):
        spark.createDataFrame(
            [("u1", seq, dt.datetime(2026, 1, 1, 0, seq))],
            "url string, op_seq long, warc_ts timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
        import glob as g
        import shutil as sh

        sh.copy(g.glob(f"{tmp_path}/stage/*.parquet")[0], src / name)

    def run_until(n_rows):
        # ProcessingTime timeMode keeps the query alive past availableNow
        # (timer maintenance), so poll the sink and stop explicitly
        stream = spark.readStream.schema(
            "url string, op_seq long, warc_ts timestamp"
        ).parquet(str(src))
        q = (
            head_tracker_v2(stream, output_mode="append", ttl_ms=1500)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                try:
                    if spark.read.parquet(str(tmp_path / "out")).count() >= n_rows:
                        return
                except Exception:
                    pass
                time.sleep(1)
            raise AssertionError(f"sink never reached {n_rows} rows")
        finally:
            q.stop()

    drop("a.parquet", 1)
    run_until(1)
    time.sleep(3)  # let the 1.5s TTL lapse on the processing clock
    drop("b.parquet", 2)
    run_until(2)  # same checkpoint: state (if alive) would carry over
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("last_seq")
        .collect()
    )
    assert [(r.n_events, r.last_seq) for r in got] == [(1, 1), (1, 2)]


def test_head_tracker_null_warc_ts_cannot_hijack_head(spark, tmp_path):
    """A null-warc_ts event in the same micro-batch as a real newer event
    must not shadow it (pandas sorts NaT LAST, and any tuple comparison
    against NaT is False — the head would freeze). Null ts sorts LOWEST,
    the table path's ORDER BY warc_ts DESC rule."""
    import pandas as pd

    from gnarly_spark.fixtures import CHANGELOG_COLUMNS, block_hash

    rows = pd.DataFrame(
        [
            (1, 0, "insert", "https://a", pd.Timestamp("2024-01-01 09:00:00")),
            (5, 1, "update", "https://a", pd.Timestamp("2024-01-01 10:00:00")),
            (6, 1, "update", "https://a", pd.NaT),
        ],
        columns=["op_seq", "block_id", "op", "url", "warc_ts"],
    )
    rows["block_hash"] = rows.block_id.map(block_hash)
    rows["parent_hash"] = None
    rows["html"] = None
    rows["lang"] = "en"
    rows["revert_of_block"] = None
    rows["reason"] = None
    d = tmp_path / "cl"
    d.mkdir()
    spark.createDataFrame(rows[CHANGELOG_COLUMNS], schema=CHANGELOG_DDL).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "chunk"))
    stream = spark.readStream.schema(CHANGELOG_DDL).parquet(str(d / "chunk"))
    out = tmp_path / "out"
    q = (
        head_tracker(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out)).toPandas().set_index("url")
    assert int(got.loc["https://a"].last_seq) == 5
    assert got.loc["https://a"].last_ts == pd.Timestamp("2024-01-01 10:00:00")
    assert int(got.loc["https://a"].n_events) == 3


def test_streaming_topk_bounds_and_finds_heavy_hitters(
    spark, rocksdb_state, tmp_path
):
    """SpaceSaving over a 3-trigger skewed stream: state stays capped at
    n_buckets x k counters, every surviving estimate satisfies the classic
    bounds (true <= est <= true + max_overcount), and the planted heavy
    hitters dominate the final global ranking."""
    import pandas as pd

    from gnarly_spark.streaming.stateful import streaming_topk

    # 3 files = 3 triggers; hot urls appear in every trigger, cold urls
    # once each — far more distinct items than k, forcing evictions
    rows = []
    for t in range(3):
        for i, hot in enumerate(["hot-a", "hot-b", "hot-c"]):
            rows += [(f"{hot}", t)] * (60 - 10 * i)
        rows += [(f"cold-{t}-{j}", t) for j in range(40)]
    d = tmp_path / "feed"
    d.mkdir()
    for t in range(3):
        pd.DataFrame(
            [r for r in rows if r[1] == t], columns=["url", "trigger"]
        ).to_parquet(d / f"part-{t}.parquet")

    stream = (
        spark.readStream.schema("url string, trigger long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = tmp_path / "out"
    q = (
        streaming_topk(stream, item_col="url", k=8, n_buckets=4)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(out)).toPandas()
    # final summary per bucket = the LAST trigger's emission = the rows
    # carrying that bucket's max cumulative bucket_n (earlier triggers'
    # rows are history, and may name since-evicted items)
    last_n = got.groupby("bucket").bucket_n.transform("max")
    final = got[got.bucket_n == last_n]
    per_bucket = final.groupby("bucket").item.count()
    assert (per_bucket <= 8).all(), per_bucket  # state capped at k
    true = pd.DataFrame(rows, columns=["url", "t"]).groupby("url").size()
    for _, r in final.iterrows():
        t = true.get(r["item"], 0)
        assert r.est_count >= t, (r["item"], r.est_count, t)
        assert r.est_count - r.max_overcount <= t, (r["item"], dict(r))
    # hash-disjoint buckets: global ranking is a plain sort; the planted
    # hot urls must hold the top 3
    top3 = set(final.sort_values("est_count", ascending=False).head(3)["item"])
    assert top3 == {"hot-a", "hot-b", "hot-c"}


def test_fold_head_null_op_seq_does_not_crash():
    """Review r05: op_seq is nullable — one NULL upcasts the pandas column
    to float64, and a winning NaN row killed the query on int(NaN). The
    shared fold stores the -1 sentinel instead (a null loses timestamp
    ties, matching the table path's op_seq DESC NULLS LAST)."""
    import pandas as pd

    from gnarly_spark.streaming.stateful import _fold_head

    t1 = pd.Timestamp("2024-01-01")
    t2 = pd.Timestamp("2024-01-02")
    # the max-ts row carries a NULL op_seq: it wins on ts, stores -1
    pdf = pd.DataFrame({"warc_ts": [t1, t2], "op_seq": [5, None]})
    n, last_seq, last_ts = _fold_head(0, -1, None, [pdf])
    assert (n, last_seq, last_ts) == (2, -1, t2)
    # on a timestamp TIE the null loses to the real seq (and the tuple
    # compare must not TypeError on the stored sentinel)
    pdf2 = pd.DataFrame({"warc_ts": [t2, t2], "op_seq": [None, 7]})
    n, last_seq, last_ts = _fold_head(n, last_seq, last_ts, [pdf2])
    assert (n, last_seq, last_ts) == (4, 7, t2)


def test_head_tracker_v2_rejects_non_positive_ttl():
    import pytest as _pytest

    from gnarly_spark.streaming.stateful import head_tracker_v2

    with _pytest.raises(ValueError, match="positive"):
        head_tracker_v2(None, ttl_ms=0)
