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


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_replicate_feed_from_zip(spark, tmp_path):
    """The Python Data Source must work when the library arrives via
    --py-files: executor python workers unpickle the reader class by
    reference and import gnarly_spark from the shipped zip."""
    from gnarly_spark.sinks.lake import ParquetLakeTable

    subprocess.run(["sh", os.path.join(REPO, "tools", "make_dist.sh")], check=True)
    zip_path = os.path.join(REPO, "dist", "gnarly_spark.zip")

    src = ParquetLakeTable(
        spark, str(tmp_path / "src"), key="url", n_buckets=2, mode="mor"
    )
    src.merge(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], schema="url string, value double"
        ),
        batch_id=0,
    )
    src.merge(
        spark.createDataFrame([("a", 3.0)], schema="url string, value double"),
        spark.createDataFrame([("b",)], schema="url string"),
        batch_id=1,
    )

    cmd = [
        "spark-submit", "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "replicate_job.py"),
        "--source", str(tmp_path / "src"),
        "--mirror", str(tmp_path / "dst"),
        "--checkpoint", str(tmp_path / "ck"),
        "--n-buckets", "2",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["mirror_rows"] == 1

    mirror = ParquetLakeTable(spark, str(tmp_path / "dst"), key="url", n_buckets=2)
    got = {(r.url, r.value) for r in mirror.read().select("url", "value").collect()}
    assert got == {("a", 3.0)}


def test_iceberg_smoke_kit_consistency():
    """The smoke kit can't execute in-sandbox (no network for --packages),
    but its pieces must stay in sync: every SMOKE step the job prints
    appears in the script's expected block, the job compiles, and the
    script drives the job file that exists."""
    import py_compile
    import re

    job = os.path.join(REPO, "tools", "iceberg_smoke_job.py")
    sh = os.path.join(REPO, "tools", "iceberg_smoke.sh")
    py_compile.compile(job, doraise=True)
    sh_text = open(sh).read()
    assert "iceberg_smoke_job.py" in sh_text
    assert os.access(sh, os.X_OK)
    job_steps = re.findall(r'step\(\s*"(\w+)"', open(job).read())
    expected_steps = re.findall(r"SMOKE (\w+) PASS", sh_text)
    assert job_steps == expected_steps, (job_steps, expected_steps)
    assert "iceberg-spark-runtime" in sh_text  # pinned package present


def test_curate_job_end_to_end(spark, tmp_path, capsys):
    """The curation CLI over a WET input: robots gate, quality+lang gates,
    exact dedup, DSIR threshold, shard export — each stage's survivor
    count lands in the metrics line and the shards hold the survivors."""
    from datetime import datetime

    from gnarly_spark.sources.warc import write_warc

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import curate_job

    en = ("the cat and the dog are in the house and they are very happy "
          "with all of this and more of the same words here")
    docs = [
        ("https://a.example/1", en),                      # keeper
        ("https://a.example/2", en),                      # exact dup: dropped
        ("https://a.example/3", en + " but slightly different tail"),
        ("https://a.example/junk", "zzqq xx 9 9 9 9 $$$$$"),   # quality/lang
        ("https://b.example/blocked", en + " unique tail"),    # robots deny
    ]
    wet_dir = tmp_path / "wet"
    wdf = spark.createDataFrame(
        [(u, datetime(2026, 1, 1), t.encode()) for u, t in docs],
        "url string, warc_ts timestamp_ntz, payload binary",
    )
    write_warc(wdf, str(wet_dir), compress=True, record_type="conversion")

    rules = tmp_path / "rules"
    spark.createDataFrame(
        [("b.example", "/", False)], "host string, prefix string, allow boolean"
    ).write.parquet(str(rules))

    out = tmp_path / "shards"
    curate_job.main([
        "--input", f"{wet_dir}/*.warc.gz", "--input-format", "wet",
        "--out", str(out), "--shards", "4",
        "--robots", str(rules),
        "--min-quality", "0.2", "--lang", "en", "--dedup",
        "--dsir-target", "doc_id LIKE 'https://a.example/1%'",
        "--dsir-min-logw", "-100000",
    ])
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["input_rows"] == 5 and m["after_robots"] == 4
    assert m["after_quality"] == 3 and m["after_lang"] == 3
    assert m["after_dedup"] == 2 and m["after_dsir"] == 2
    assert m["shards"] == 4

    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    assert kept == {"https://a.example/1", "https://a.example/3"}
