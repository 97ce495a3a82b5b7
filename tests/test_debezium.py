"""Debezium CDC envelope adapter: byte-identical round trip through the
public Kafka-Connect wire format (before/after images, c/u/d/m op codes,
base64 binary, microsecond timestamps), dead-letter + tombstone routing,
the outbox direction (lake change feed -> envelopes), and an end-to-end
pipeline drain over an envelope topic dump matching the pandas replay
oracle — the wire format real binlog tails emit, re-expressed as a Spark
source (the reference normalizes its own RPC JSON instead,
ingestion/Web3Api.ts:102-130)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from gnarly_spark.fixtures import gen_changelog, oracle_final_state
from gnarly_spark.sources.changelog import order_files_by_name
from gnarly_spark.sources.debezium import (
    debezium_dead_letters,
    debezium_events,
    debezium_tombstones,
    feed_to_debezium,
    parse_debezium,
    read_debezium,
    write_debezium,
)
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
from tests.conftest import assert_pdf_equal


def test_debezium_roundtrip_byte_identical(spark, to_spark, tmp_path):
    """write -> read restores every changelog row exactly: delete rows ride
    the BEFORE image (the Debezium delete contract), reverts ride 'm'
    control envelopes, html bytes and microsecond timestamps survive."""
    log = gen_changelog(n_blocks=8, events_per_block=4, fork_depth=2)
    df = to_spark(log)
    path = str(tmp_path / "dbz")
    write_debezium(df, path, n_files=2)
    parsed = read_debezium(spark, path)
    back = debezium_events(parsed)
    a = df.toPandas().sort_values("op_seq").reset_index(drop=True)
    b = back.toPandas().sort_values("op_seq").reset_index(drop=True)
    assert_pdf_equal(a, b)
    assert debezium_dead_letters(parsed).count() == 0
    assert debezium_tombstones(parsed).count() == 0
    # the fixture has all four op kinds, so every wire op code was exercised
    assert set(a["op"]) >= {"insert", "update", "delete", "revert"}


def test_debezium_wire_shape(spark, to_spark, tmp_path):
    """The emitted JSON is the public envelope shape: deletes carry ONLY
    before, others ONLY after; op codes are Debezium's."""
    log = gen_changelog(n_blocks=6, events_per_block=4)
    path = str(tmp_path / "dbz")
    write_debezium(to_spark(log), path, n_files=1)
    lines = [
        json.loads(line)
        for fn in os.listdir(path)
        if fn.startswith("part-")
        for line in open(os.path.join(path, fn))
    ]
    assert lines and all(e["op"] in ("c", "u", "d", "m") for e in lines)
    for e in lines:
        if e["op"] == "d":
            assert "before" in e and "after" not in e  # to_json drops nulls
            assert e["before"]["url"].startswith("http")
        else:
            assert "after" in e and "before" not in e
        assert isinstance(e["source"]["seq"], int)


def test_debezium_dead_letters_and_tombstones(spark, to_spark, tmp_path):
    log = gen_changelog(n_blocks=4, events_per_block=3)
    path = str(tmp_path / "dbz")
    write_debezium(to_spark(log), path, n_files=1)
    with open(os.path.join(path, "z-poison.txt"), "w") as f:
        f.write("{not json\n")  # malformed
        f.write('{"ts_ms": "x7", "op": "u", "source": {"seq": 3}}\n')  # malformed (type)
        f.write('{"op": "z", "source": {"seq": 1}, "after": {"url": "u"}}\n')  # bad_op
        f.write('{"source": {"seq": 1}, "after": {"url": "u"}}\n')  # bad_op (missing)
        f.write('{"op": "u", "after": {"url": "u"}}\n')  # missing_seq
        f.write("null\n")  # Kafka tombstone — protocol, NOT poison
    parsed = read_debezium(spark, path)
    assert debezium_events(parsed).count() == len(log)
    dead = debezium_dead_letters(parsed).toPandas()
    assert sorted(dead["reason"]) == [
        "bad_op",
        "bad_op",
        "malformed",
        "malformed",
        "missing_seq",
    ]
    assert "{not json" in set(dead["raw"])
    assert debezium_tombstones(parsed).count() == 1


def test_pipeline_drains_debezium_tail(spark, to_spark, tmp_path):
    """The full CDC engine over an envelope topic dump: micro-batched
    drain with a reorg (reverts arrive as 'm' envelopes), poison
    dead-lettered per batch, final table == pandas replay oracle."""
    import math
    import shutil

    log = gen_changelog(n_blocks=12, events_per_block=4, fork_depth=2)
    src = str(tmp_path / "dbz")
    os.makedirs(src, exist_ok=True)
    n_chunks = 4
    chunk = math.ceil(len(log) / n_chunks)
    for i in range(n_chunks):
        part = log.iloc[i * chunk : (i + 1) * chunk]
        if not len(part):
            continue
        tmpd = os.path.join(src, f".tmp{i}")
        write_debezium(to_spark(part), tmpd, n_files=1)
        pf = next(f for f in os.listdir(tmpd) if f.startswith("part-"))
        os.rename(os.path.join(tmpd, pf), os.path.join(src, f"{i:04d}.txt"))
        shutil.rmtree(tmpd)
    with open(os.path.join(src, "0001.txt"), "a") as f:
        f.write("poison envelope\n")
    order_files_by_name(src, "*.txt")
    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    p.start(
        src, available_now=True, max_files_per_trigger=1, source_format="debezium"
    ).awaitTermination()
    got = (
        p.pages()
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "warc_ts", "html", "text", "lang"]]
    )
    want = oracle_final_state(log)[["url", "warc_ts", "html", "text", "lang"]]
    assert_pdf_equal(got, want)
    dead = p.dead_letters().toPandas()
    assert list(dead["raw"]) == ["poison envelope"]
    assert list(dead["reason"]) == ["malformed"]


def test_outbox_feed_to_debezium(spark, tmp_path):
    """The outbox direction: a lake changelog() image feed collapses to
    one envelope per key — update pairs into a single 'u' with BOTH
    images, inserts 'c' (after only), deletes 'd' (before only) — and the
    adapter's own parser ingests the result (full loop: lake -> wire ->
    changelog rows)."""
    feed = spark.createDataFrame(
        [
            ("u1", "insert", None, 10.0),
            ("u2", "update_before", 1.0, 1.0),
            ("u2", "update_after", 2.0, 2.0),
            ("u3", "delete", 3.0, 3.0),
        ],
        schema="url string, _change_type string, old_v double, v double",
    ).select("url", "_change_type", "v")
    env = feed_to_debezium(feed, key="url", seq_start=100, version=7)
    lines = [json.loads(r.value) for r in env.collect()]
    by_key = {
        (e.get("after") or e.get("before"))["url"]: e for e in lines
    }
    assert by_key["u1"]["op"] == "c" and "before" not in by_key["u1"]
    assert by_key["u1"]["after"]["v"] == 10.0
    assert by_key["u2"]["op"] == "u"
    assert by_key["u2"]["before"]["v"] == 1.0 and by_key["u2"]["after"]["v"] == 2.0
    assert by_key["u3"]["op"] == "d" and "after" not in by_key["u3"]
    assert sorted(e["source"]["seq"] for e in lines) == [100, 101, 102]
    assert all(e["source"]["version"] == 7 for e in lines)
    # the parser ingests the outbox stream back as changelog rows
    ddl = "op_seq long, op string, url string, v double"
    back = debezium_events(parse_debezium(env, ddl), ddl).toPandas()
    assert len(back) == 3
    assert set(back["op"]) == {"insert", "update", "delete"}
    assert back.set_index("url").loc["u2", "v"] == 2.0
    assert back.set_index("url").loc["u3", "v"] == 3.0  # before image routed


def test_export_outbox_incremental_and_resumable(spark, tmp_path):
    """Outbox export: per-commit envelope files with monotone seqs across
    runs; a re-run with no new commits exports nothing; the exported
    stream parses back into the table's cumulative change history."""
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"),
        batch_id=0,
    )
    t.merge(
        spark.createDataFrame([("a", 10), ("c", 3)], "url string, v int"),
        batch_id=1,
    )
    out = str(tmp_path / "outbox")
    r1 = export_outbox(t, out)
    assert r1["exported_versions"] == [0, 1] and r1["envelopes"] == 4
    # no new commits: nothing exported, cursor holds
    r2 = export_outbox(t, out)
    assert r2["exported_versions"] == [] and r2["envelopes"] == 0
    # new delete commit: one more file, seqs continue past the first run
    t.merge(
        None,
        delete_keys=spark.createDataFrame([("b",)], "url string"),
        batch_id=2,
    )
    r3 = export_outbox(t, out)
    assert r3["exported_versions"] == [2] and r3["envelopes"] == 1
    lines = [
        json.loads(line)
        for f in sorted(os.listdir(out))
        if f.endswith(".jsonl")
        for line in open(os.path.join(out, f))
    ]
    seqs = sorted(e["source"]["seq"] for e in lines)
    assert seqs == list(range(5))  # monotone, gap-free across runs
    # the full exported stream parses back: v0 is the initial snapshot
    # (Debezium 'r' rows), v1 updates a and inserts c, v2 deletes b
    # (before image carries the key)
    ops = {}
    for e in lines:
        img = e.get("after") or e.get("before")
        ops.setdefault(img["url"], []).append((e["source"]["version"], e["op"]))
    assert ops["a"] == [(0, "r"), (1, "u")]
    assert ops["b"] == [(0, "r"), (2, "d")]
    assert ops["c"] == [(1, "c")]


def test_pipeline_outbox_option(spark, to_spark, tmp_path):
    """outbox_dir: every pipeline commit exports envelope files; the
    concatenated outbox replays (via the adapter's own parser + LWW) to
    the pipeline's final table state — lake and outbox can never
    disagree."""
    from pyspark.sql import functions as F

    from gnarly_spark.operators.replay import last_writer_wins

    log = gen_changelog(n_blocks=10, events_per_block=4, fork_depth=2)
    src = str(tmp_path / "src")
    to_spark(log).repartition(1).write.parquet(src)
    out = str(tmp_path / "outbox")
    p = CdcIngestPipeline(spark, str(tmp_path / "work"), outbox_dir=out)
    p.start(src, available_now=True, max_files_per_trigger=2).awaitTermination()
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) == p.target.current_version() + 1  # one per commit
    # replay the outbox: parse envelopes, LWW on seq, drop deletes
    ddl = "op_seq long, op string, url string, text string, lang string"
    env = spark.read.text(os.path.join(out, "*.jsonl"))
    rows = debezium_events(parse_debezium(env, ddl), ddl)
    state = (
        rows.groupBy("url")
        .agg(F.max_by(F.struct("op", "text", "lang"), "op_seq").alias("w"))
        .where(F.col("w.op") != "delete")
        .select("url", F.col("w.text").alias("text"), F.col("w.lang").alias("lang"))
    )
    want = (
        p.pages()
        .select("url", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got = state.toPandas().sort_values("url").reset_index(drop=True)
    from tests.conftest import assert_pdf_equal

    assert_pdf_equal(got, want)


def test_schemas_enabled_wrapper_auto_unwrap(spark):
    """Kafka Connect JsonConverter with schemas.enable=true wraps values
    as {"schema":..., "payload": envelope}; the parser auto-detects and
    unwraps, including the wrapped tombstone form."""
    ddl = "op_seq long, op string, url string"
    env = {"op": "c", "source": {"seq": 5}, "after": {"url": "https://x/1"}}
    lines = spark.createDataFrame(
        [
            (json.dumps({"schema": {"type": "struct"}, "payload": env}),),
            (json.dumps(env),),  # bare envelope still parses
            (json.dumps({"schema": {"type": "struct"}, "payload": None}),),
            ("null",),
        ],
        schema="value string",
    )
    parsed = parse_debezium(lines, ddl)
    ev = debezium_events(parsed, ddl).collect()
    assert len(ev) == 2 and all(r.url == "https://x/1" and r.op_seq == 5 for r in ev)
    assert debezium_tombstones(parsed).count() == 2
    assert debezium_dead_letters(parsed).count() == 0


def test_outbox_job_cli(spark, tmp_path, capsys):
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from jobs.outbox_job import main

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"),
        batch_id=0,
    )
    main(["--table", str(tmp_path / "t"), "--out", str(tmp_path / "ob")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["exported_versions"] == 1 and out["envelopes"] == 2
    assert os.path.exists(str(tmp_path / "ob" / "v0.jsonl"))


def test_export_outbox_skips_branch_commits(spark, tmp_path):
    """Refs share the version-number space: an interleaved BRANCH commit
    must not be exported (unpublished data) and the next main commit
    must diff against the previous MAIN snapshot, not version-minus-one."""
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(spark.createDataFrame([("a", 1)], "url string, v int"), batch_id=0)
    br = t.create_branch("wip")
    br.merge(spark.createDataFrame([("z", 9)], "url string, v int"), batch_id=1)
    t.merge(spark.createDataFrame([("b", 2)], "url string, v int"), batch_id=2)
    out = str(tmp_path / "ob")
    r = export_outbox(t, out)
    # main chain only: v0 and the later main commit; the branch number gap
    assert len(r["exported_versions"]) == 2
    lines = [
        json.loads(line)
        for f in sorted(os.listdir(out))
        if f.endswith(".jsonl")
        for line in open(os.path.join(out, f))
    ]
    urls = {(e.get("after") or e.get("before"))["url"] for e in lines}
    assert urls == {"a", "b"}  # the branch's 'z' never leaks
    # and the main diff is main-vs-main: exactly one 'c' for b, no noise
    assert [e["op"] for e in lines if (e.get("after") or {}).get("url") == "b"] == ["c"]


def test_export_outbox_bootstraps_after_retention(spark, tmp_path):
    """Fresh outbox on a mature table (early snapshots expired): the
    export emits a full-state snapshot file of 'r' rows, then resumes
    incrementally — no FileNotFoundError, no silent gap."""
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    for i in range(4):
        t.merge(
            spark.createDataFrame([(f"u{i}", i)], "url string, v int"),
            batch_id=i,
        )
    t.expire_snapshots(keep_last=2)  # v0/v1 manifests gone
    out = str(tmp_path / "ob")
    r = export_outbox(t, out)
    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert len(files) == len(r["exported_versions"]) == 2
    first = [json.loads(x) for x in open(os.path.join(out, files[0]))]
    assert all(e["op"] == "r" for e in first)  # full-state snapshot file
    assert {e["after"]["url"] for e in first} == {"u0", "u1", "u2"}
    second = [json.loads(x) for x in open(os.path.join(out, files[1]))]
    assert [e["op"] for e in second] == ["c"] and second[0]["after"]["url"] == "u3"
    # the parser ingests 'r' as insert (Debezium snapshot-read semantics)
    ddl = "op_seq long, op string, url string, v int"
    rows = debezium_events(
        parse_debezium(spark.read.text(os.path.join(out, "*.jsonl")), ddl), ddl
    )
    assert rows.where(F.col("op") == "insert").count() == 4


def test_unroutable_image_dead_letters_not_null_key_row(spark):
    """A 'd' without a before image (or c/u without after) must dead-
    letter as no_image — flattening it would emit a NULL-key delete that
    silently no-ops downstream (NULL never equi-joins)."""
    ddl = "op_seq long, op string, url string"
    lines = spark.createDataFrame(
        [
            ('{"op": "d", "source": {"seq": 1}}',),
            ('{"op": "c", "source": {"seq": 2}}',),
            ('{"op": "m", "source": {"seq": 3}}',),  # control: image optional
            ('{"op": "d", "source": {"seq": 4}, "before": {"url": "u"}}',),
        ],
        schema="value string",
    )
    parsed = parse_debezium(lines, ddl)
    dead = debezium_dead_letters(parsed).toPandas()
    assert sorted(dead["reason"]) == ["no_image", "no_image"]
    ev = debezium_events(parsed, ddl).collect()
    assert {(r.op, r.url) for r in ev} == {("revert", None), ("delete", "u")}


def test_outbox_binary_columns_base64_contract(spark):
    """feed_to_debezium must put binary columns on the wire as explicit
    base64 — the same contract write_debezium uses — and the parser must
    restore the exact bytes."""
    feed = spark.createDataFrame(
        [("k1", "insert", bytearray(b"\x00\xffraw"))],
        schema="url string, _change_type string, html binary",
    )
    env = feed_to_debezium(feed, key="url", seq_start=0)
    e = json.loads(env.collect()[0].value)
    import base64

    assert e["after"]["html"] == base64.b64encode(b"\x00\xffraw").decode()
    ddl = "op_seq long, op string, url string, html binary"
    back = debezium_events(parse_debezium(env, ddl), ddl).collect()[0]
    assert bytes(back.html) == b"\x00\xffraw"


def test_feed_to_debezium_seq_two_phase_no_global_window(spark):
    """VERDICT r03 #2: envelope seq assignment must never be a global
    unpartitioned window (one task sorts the whole relation on the
    snapshot-bootstrap path). Every Window in the plan is partitioned by
    the range-partition id, and seqs still equal the global rank by key."""
    import re as _re

    feed = spark.createDataFrame(
        [(f"k{i:04d}", "insert", float(i)) for i in range(257)],
        "url string, _change_type string, v double",
    )
    # small_delta_rows=0 forces the bootstrap-scale path (the fast path
    # for bounded deltas IS a single-window sort, by design)
    env = feed_to_debezium(
        feed, key="url", seq_start=10, n_ranges=8, small_delta_rows=0
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    for line in plan.splitlines():
        if _re.search(r"\bWindow\b", line):
            assert "_pid" in line, line
    lines = [json.loads(r.value) for r in env.collect()]
    by_key = {e["after"]["url"]: e["source"]["seq"] for e in lines}
    want = {f"k{i:04d}": 10 + i for i in range(257)}  # global rank by key
    assert by_key == want


def test_export_outbox_bootstrap_parallel_identical_seqs(spark, tmp_path):
    """ADVICE r03: the snapshot bootstrap (fresh outbox on a mature table)
    pushes the WHOLE table through feed_to_debezium — at >= 8 range
    partitions the export must produce the same gap-free seqs and
    byte-identical files as any re-export, with envelope order preserved
    in the concatenated v{N}.jsonl."""
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    dp = spark.sparkContext.defaultParallelism
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    rows = [(f"u{i:04d}", i) for i in range(300)]
    t.merge(spark.createDataFrame(rows, "url string, v int"), batch_id=0)
    t.merge(
        spark.createDataFrame([("u0001", -1), ("zz", 99)], "url string, v int"),
        batch_id=1,
    )
    t.expire_snapshots(keep_last=1)  # force the bootstrap 'r' path
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    ra = export_outbox(t, out_a)
    rb = export_outbox(t, out_b)
    assert ra["envelopes"] == rb["envelopes"] == 301
    (fa,) = [f for f in sorted(os.listdir(out_a)) if f.endswith(".jsonl")]
    bytes_a = open(os.path.join(out_a, fa), "rb").read()
    bytes_b = open(os.path.join(out_b, fa), "rb").read()
    assert bytes_a == bytes_b  # re-export reproduces identical bytes
    envs = [json.loads(x) for x in bytes_a.splitlines()]
    seqs = [e["source"]["seq"] for e in envs]
    assert seqs == sorted(seqs) == list(range(301))  # file order = seq order
    assert all(e["op"] == "r" for e in envs)
    # and the file's key order is the global key order (what the seq ranks)
    keys = [e["after"]["url"] for e in envs]
    assert keys == sorted(keys)
    assert dp >= 2  # the parallel write exercised > 1 range


def test_export_outbox_multifile_bootstrap_contract(spark, tmp_path):
    """VERDICT r04 #2: a bootstrap export over the single-file size
    threshold publishes range-ordered v{N}-part-{i}.jsonl files plus a
    manifest (count + seq range per part, landing last) instead of a
    driver-side concat. Forced here via max_single_file_bytes=0 and
    small_delta_rows=0 (two-phase seq path), >= 8 ranges: the multi-file
    layout must carry the same dense seqs, byte-identical across
    re-exports, with the manifest agreeing with the files."""
    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    assert spark.sparkContext.defaultParallelism >= 2
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    rows = [(f"u{i:04d}", i) for i in range(300)]
    t.merge(spark.createDataFrame(rows, "url string, v int"), batch_id=0)
    t.merge(
        spark.createDataFrame([("u0001", -1), ("zz", 99)], "url string, v int"),
        batch_id=1,
    )
    t.expire_snapshots(keep_last=1)  # force the bootstrap 'r' path
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    kw = dict(max_single_file_bytes=0, small_delta_rows=0)
    ra = export_outbox(t, out_a, **kw)
    rb = export_outbox(t, out_b, **kw)
    assert ra["envelopes"] == rb["envelopes"] == 301

    def read_layout(out):
        parts = sorted(
            f for f in os.listdir(out) if "-part-" in f and f.endswith(".jsonl")
        )
        (man_file,) = [f for f in os.listdir(out) if f.endswith(".manifest.json")]
        man = json.load(open(os.path.join(out, man_file)))
        blob = b"".join(
            open(os.path.join(out, p), "rb").read() for p in parts
        )
        return parts, man, blob

    parts_a, man_a, blob_a = read_layout(out_a)
    parts_b, man_b, blob_b = read_layout(out_b)
    assert len(parts_a) >= 2  # genuinely parallel layout
    assert blob_a == blob_b and man_a == man_b  # re-export reproduces
    assert [p["file"] for p in man_a["parts"]] == parts_a
    assert man_a["envelopes"] == 301
    # dense, file-ordered seqs; manifest ranges contiguous and accurate
    envs = [json.loads(x) for x in blob_a.splitlines()]
    seqs = [e["source"]["seq"] for e in envs]
    assert seqs == list(range(301))
    cum = 0
    for p in man_a["parts"]:
        lines = open(os.path.join(out_a, p["file"])).read().splitlines()
        assert len(lines) == p["count"]
        assert p["seq_first"] == cum and p["seq_last"] == cum + p["count"] - 1
        cum += p["count"]
    # no single-file artifact in the multi-file layout
    assert not os.path.exists(os.path.join(out_a, "v1.jsonl"))
    # a later SMALL incremental delta goes back to single-file and heals
    # nothing (different version namespace)
    t.merge(
        spark.createDataFrame([("u0002", -2)], "url string, v int"), batch_id=2
    )
    r2 = export_outbox(t, out_a)
    assert r2["envelopes"] == 1
    v2 = [f for f in os.listdir(out_a) if f.startswith("v2")]
    assert v2 == ["v2.jsonl"]
    (env2,) = [json.loads(x) for x in open(os.path.join(out_a, "v2.jsonl"))]
    assert env2["source"]["seq"] == 301  # seq continues across layouts


def test_read_outbox_verifies_manifest(spark, tmp_path):
    """Consumer contract: read_outbox reads both layouts as one stream,
    fails loud when a manifested part is missing or an unlisted part
    lingers, and skips a mid-publish version (parts, no manifest yet)."""
    import pytest

    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox, read_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    rows = [(f"u{i:04d}", i) for i in range(100)]
    t.merge(spark.createDataFrame(rows, "url string, v int"), batch_id=0)
    t.merge(
        spark.createDataFrame([("u0001", -1)], "url string, v int"), batch_id=1
    )
    out = str(tmp_path / "ob")
    # v0 multi-file (forced), v1 single-file (small delta, default path)
    export_outbox(t, out, max_single_file_bytes=0, small_delta_rows=0)
    n_all = read_outbox(spark, out).count()
    assert n_all == 101  # both layouts in one stream
    parts = sorted(
        f for f in os.listdir(out) if "-part-" in f and f.endswith(".jsonl")
    )
    assert parts  # multi-file layout actually exercised
    # missing manifested part -> loud
    victim = os.path.join(out, parts[0])
    backup = victim + ".bak"
    os.rename(victim, backup)
    with pytest.raises(ValueError, match="missing parts"):
        read_outbox(spark, out).count()
    os.rename(backup, victim)
    # unlisted (stale wider-attempt) part -> loud
    stray = os.path.join(out, f"v0-part-{len(parts):05d}.jsonl")
    open(stray, "w").write('{"x":1}\n')
    with pytest.raises(ValueError, match="unlisted parts"):
        read_outbox(spark, out).count()
    os.remove(stray)
    # mid-publish version (parts, no manifest): skipped, not an error
    open(os.path.join(out, "v9-part-00000.jsonl"), "w").write('{"x":1}\n')
    assert read_outbox(spark, out).count() == n_all


def test_export_outbox_crash_resume_adopts_published_file(spark, tmp_path):
    """Review r05: a crash BETWEEN publishing v{N} and the state write,
    followed by snapshot expiry of the incremental base, must NOT rewrite
    the already-published file as a snapshot bootstrap under the SAME
    seqs — a consumer may have ingested it, and seq is the idempotency
    key. The resume run adopts the complete artifact byte-for-byte."""
    import json as _json

    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    t.merge(
        spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"),
        batch_id=0,
    )
    t.merge(
        spark.createDataFrame([("a", 10), ("c", 3)], "url string, v int"),
        batch_id=1,
    )
    out = str(tmp_path / "ob")
    r = export_outbox(t, out)
    assert r["envelopes"] == 4  # v0: 2 'r' rows? no — v0 incremental c's
    v1_bytes = open(os.path.join(out, "v1.jsonl"), "rb").read()
    state_p = os.path.join(out, "_outbox_state.json")
    state = _json.load(open(state_p))
    # simulate the crash window: state says v1 was never exported
    with open(state_p, "w") as f:
        _json.dump({"cursor": 0, "next_seq": 2}, f)
    # and the incremental base for v1 is now gone
    t.expire_snapshots(keep_last=1)
    r2 = export_outbox(t, out)
    assert r2["exported_versions"] == [1]
    # adopted, not rewritten: identical bytes, NOT a snapshot 'r' file
    assert open(os.path.join(out, "v1.jsonl"), "rb").read() == v1_bytes
    assert _json.load(open(state_p)) == state  # cursor/seq fully restored


def test_read_outbox_mixed_layout_fails_loud(spark, tmp_path):
    """A version carrying BOTH layouts (crash mid-layout-switch) must not
    be read twice: verify raises; best-effort mode reads the manifested
    parts only."""
    import pytest as _pytest

    from gnarly_spark.sinks.lake import ParquetLakeTable
    from gnarly_spark.sources.debezium import export_outbox, read_outbox

    t = ParquetLakeTable(spark, str(tmp_path / "t"), key="url", n_buckets=2)
    rows = [(f"u{i:03d}", i) for i in range(50)]
    t.merge(spark.createDataFrame(rows, "url string, v int"), batch_id=0)
    out = str(tmp_path / "ob")
    export_outbox(t, out, max_single_file_bytes=0, small_delta_rows=0)
    n = read_outbox(spark, out).count()
    assert n == 50
    # fabricate the torn state: a stale single-file artifact reappears
    with open(os.path.join(out, "v0.jsonl"), "w") as f:
        f.write('{"stale": true}\n')
    with _pytest.raises(ValueError, match="BOTH layouts"):
        read_outbox(spark, out).count()
    assert read_outbox(spark, out, verify_manifests=False).count() == n


def test_write_debezium_ts_ms_timezone_independent(spark, tmp_path):
    """ADVICE r03: ts_ms must read the TIMESTAMP_NTZ wall clock AS UTC —
    identical output whatever the session timezone (the old cast-based
    derivation shifted by the session offset)."""
    import datetime as _dt

    from gnarly_spark.sources.debezium import write_debezium

    ddl = "op_seq long, op string, url string, warc_ts timestamp_ntz"
    events = spark.createDataFrame(
        [(1, "insert", "u1", _dt.datetime(2024, 3, 10, 6, 30, 15))],
        schema=ddl,
    )
    want_ms = int(
        _dt.datetime(2024, 3, 10, 6, 30, 15, tzinfo=_dt.timezone.utc).timestamp()
        * 1000
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        out = {}
        for tag, tz in [("utc", "UTC"), ("ny", "America/New_York")]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            p = str(tmp_path / tag)
            write_debezium(events, p, changelog_ddl=ddl, n_files=1)
            (line,) = [
                json.loads(x)
                for f in os.listdir(p)
                if f.startswith("part-")
                for x in open(os.path.join(p, f))
            ]
            out[tag] = line["ts_ms"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert out["utc"] == out["ny"] == want_ms
