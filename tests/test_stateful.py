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
