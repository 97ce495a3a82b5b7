"""Deployment drive: the packaged job (spark-submit --py-files) replays a
forked changelog in micro-batches and reproduces the pandas oracle
bit-for-bit — the north_rule's "ships via spark-submit --py-files" clause
exercised for real (fresh JVM, imports from the zip, checkpointed stream).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_ingest_matches_oracle(spark, tmp_path):
    from gnarly_spark import fixtures
    from gnarly_spark.sinks.lake import ParquetLakeTable

    # package the library exactly as a deployment would
    subprocess.run(["sh", os.path.join(REPO, "tools", "make_dist.sh")], check=True)
    zip_path = os.path.join(REPO, "dist", "gnarly_spark.zip")

    # forked changelog split into 2 source files = 2 micro-batches
    log = fixtures.gen_changelog(n_blocks=20, events_per_block=6, seed=5, fork_depth=3)
    mx = int(log.block_id.max())
    sdf = spark.createDataFrame(log)
    chlog = tmp_path / "changelog"
    chlog.mkdir()
    for i, (lo, hi) in enumerate([(0, 12), (12, mx + 1)]):
        stage = tmp_path / f"stage{i}"
        sdf.where((sdf.block_id >= lo) & (sdf.block_id < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        shutil.copy(glob.glob(f"{stage}/*.parquet")[0], chlog / f"part-{i}.parquet")

    work = tmp_path / "work"
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "ingest_job.py"),
        "--changelog", str(chlog), "--work", str(work),
        "--available-now", "--max-files-per-trigger", "1",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["batches"] == 2 and stats["events"] == len(log)

    want = fixtures.oracle_final_state(log).sort_values("url").reset_index(drop=True)
    tbl = ParquetLakeTable(spark, str(work / "pages"), key="url")
    got = (
        tbl.read()
        .select("url", "warc_ts", "html", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_like=True
    )
