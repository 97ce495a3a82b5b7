"""Event-time windowed aggregation with watermark: late-but-within-
watermark events are incorporated, events older than the watermark are
dropped, and the same code path runs in batch (backfill parity)."""

from __future__ import annotations

import os
import time

import pandas as pd

from gnarly_spark.streaming.windows import windowed_lang_rates

DDL = "url string, warc_ts timestamp, lang string"


def _write(spark, rows, path, mtime):
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    spark.createDataFrame(pdf, schema=DDL).coalesce(1).write.parquet(path)
    os.utime(path, (mtime, mtime))
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def test_watermark_drops_too_late_keeps_in_window(spark, tmp_path):
    src = str(tmp_path / "stream")
    os.makedirs(src)
    t0 = time.time() - 1000
    # trigger 1: events at 12:00/12:10 -> afterwards, watermark = 11:10
    _write(
        spark,
        [("u1", "2024-01-01 12:00:00", "en"), ("u2", "2024-01-01 12:10:00", "en")],
        os.path.join(src, "chunk=0000"),
        t0,
    )
    stream = spark.readStream.schema(DDL).parquet(src)
    agg = windowed_lang_rates(stream, window_len="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_rates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )

    def _in_rows():
        return sum(p["numInputRows"] for p in q.recentProgress)

    def _watermark():
        lp = q.lastProgress
        return (lp or {}).get("eventTime", {}).get("watermark", "")

    def _dropped():
        return sum(
            o.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for o in p["stateOperators"]
        )

    try:
        deadline = time.monotonic() + 60
        while _in_rows() < 2 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert _in_rows() == 2, "first file never processed"
        # the max-event-time-derived watermark takes effect only in a batch
        # AFTER the one that read 12:10 — wait until a progress entry shows
        # it active (Spark runs a no-data batch to propagate it), otherwise
        # the late file can be read by a trigger still at the initial
        # watermark and nothing is dropped (flaked under full-suite load)
        deadline = time.monotonic() + 60
        while _watermark() < "2024-01-01T11:10:00" and time.monotonic() < deadline:
            time.sleep(0.5)
        assert _watermark() >= "2024-01-01T11:10:00", "watermark never advanced"
        # second file arrives AFTER the watermark advanced: 10:30 is older
        # than the watermark (dropped); 11:30 is late but within it
        # (incorporated into the 11:00 window)
        _write(
            spark,
            [("u3", "2024-01-01 10:30:00", "en"), ("u4", "2024-01-01 11:30:00", "en")],
            os.path.join(src, "chunk=0001"),
            t0 + 10,
        )
        deadline = time.monotonic() + 60
        while _in_rows() < 4 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert _in_rows() == 4, "second file never processed"
        deadline = time.monotonic() + 30
        while _dropped() < 1 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert _dropped() == 1, "exactly the too-late 10:30 event is dropped"
    finally:
        q.stop()

    got = spark.sql(
        "SELECT window_start, MAX(n_changes) AS n FROM win_rates GROUP BY 1"
    ).collect()
    by_start = {r.window_start.strftime("%H:%M"): r.n for r in got}
    assert "10:00" not in by_start, f"too-late event must be dropped: {by_start}"
    assert by_start.get("11:00") == 1  # the 11:30 late-but-ok event
    assert by_start.get("12:00") == 2


def test_windowed_rates_batch_parity(spark, tmp_path):
    """The same function over a batch DataFrame (backfill) returns the full
    aggregation including what streaming dropped as late."""
    pdf = pd.DataFrame(
        [
            ("u1", "2024-01-01 12:00:00", "en"),
            ("u2", "2024-01-01 12:10:00", "en"),
            ("u3", "2024-01-01 10:30:00", "de"),
        ],
        columns=["url", "warc_ts", "lang"],
    )
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    out = windowed_lang_rates(spark.createDataFrame(pdf, schema=DDL)).collect()
    got = {(r.window_start.strftime("%H:%M"), r.lang): (r.n_changes, r.n_urls) for r in out}
    assert got == {("12:00", "en"): (2, 2), ("10:00", "de"): (1, 1)}


def test_streaming_sessionize_cross_batch_merge_and_watermark(spark, tmp_path):
    """session_rollup over a real stream: a session spanning MICRO-BATCHES
    merges in the state store; an event older than the watermark is
    dropped (state for closed sessions is evicted, never reopened); a
    far-future flush row emits every closed session in append mode."""
    import uuid

    from gnarly_spark.streaming.windows import session_rollup

    ddl = "user_id long, ts timestamp"
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 1000
    rows1 = [(1, "2024-01-01 12:00:00"), (1, "2024-01-01 12:10:00"),
             (2, "2024-01-01 12:05:00")]
    rows2 = [(1, "2024-01-01 12:25:00")]  # within 30min of 12:10 -> same session
    # 10:00 is older than the watermark (12:25 - 1h) by file 3: dropped;
    # user 99 is the far-future flush that closes every real session
    rows3 = [(1, "2024-01-01 10:00:00"), (99, "2024-03-01 00:00:00")]
    for i, rows in enumerate([rows1, rows2, rows3]):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        p = os.path.join(src, f"chunk={i:04d}")
        spark.createDataFrame(pdf, schema=ddl).coalesce(1).write.parquet(p)
        for f in [p] + [os.path.join(p, x) for x in os.listdir(p)]:
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(src)
    sess = session_rollup(stream, gap="30 minutes", watermark="1 hour")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        o.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for o in p["stateOperators"]
    )
    assert dropped == 1, "exactly the too-late 10:00 event is dropped"
    got = {
        (r.user_id, r.session_start.strftime("%H:%M"),
         r.session_end.strftime("%H:%M"), r.n_events)
        for r in spark.table(name).where("user_id < 99").collect()
    }
    assert got == {
        (1, "12:00", "12:25", 3),  # merged ACROSS three micro-batches
        (2, "12:05", "12:05", 1),
    }, got


def test_streaming_sessionize_batch_parity(spark):
    """The same session_rollup code over a batch DataFrame returns every
    session including what streaming would have dropped as late."""
    import datetime as dt

    from gnarly_spark.streaming.windows import session_rollup

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=41)),  # 31min after 12:10: new session
        (2, base - dt.timedelta(hours=5)),     # 'late' — batch keeps it
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.n_events)
        for r in session_rollup(df, gap="30 minutes").collect()
    }
    assert got == {(1, 2), (1, 1), (2, 1)}


def test_drop_duplicates_within_watermark_cross_batch(spark, tmp_path):
    """At-least-once redelivery: a duplicate (url, op_seq) arriving in a
    LATER micro-batch — inside the watermark — must be passed exactly
    once; distinct pairs all survive. (State is watermark-bounded, unlike
    plain dropDuplicates.)"""
    import datetime as dt
    import time
    import uuid

    base = dt.datetime(2026, 6, 1, 12, 0, 0)
    ddl = "url string, op_seq long, warc_ts timestamp"
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [("u1", 1, base), ("u2", 2, base + dt.timedelta(minutes=1))], ddl
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 2 redelivers u1/1 (same event time, well inside the 1h
    # watermark) and adds a new pair
    b2 = spark.createDataFrame(
        [("u1", 1, base), ("u3", 3, base + dt.timedelta(minutes=2))], ddl
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("warc_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["url", "op_seq"])
    )
    name = f"ddw_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["url"], r["op_seq"]) for r in spark.table(name).collect()
    )
    assert got == [("u1", 1), ("u2", 2), ("u3", 3)]
