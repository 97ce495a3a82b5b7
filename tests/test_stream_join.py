"""Stream-stream interval join: multi-batch parity with batch, late drops."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from gnarly_spark.streaming.joins import attribute_purchases

_DDL = "user_id long, ts timestamp, value double, event_type string"


def _rows(spark, rows):
    return spark.createDataFrame(rows, _DDL)


def _drain(spark, views, purchases, work, **kw):
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        attribute_purchases(views, purchases, **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{work}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["view_ts"], r["purchase_ts"]) for r in spark.table(name).collect()
    }


def test_streaming_join_multi_batch_equals_batch_join(spark, tmp_path):
    """Time-ordered files -> multiple triggers; nothing is late, so the
    streaming answer must equal the plain batch interval join."""
    import datetime as dt

    base = dt.datetime(2026, 5, 1)
    rows = []
    for i in range(300):
        t = base + dt.timedelta(minutes=3 * i)
        rows.append((i % 5, t, float(i), "view" if i % 3 else "purchase"))
    df = _rows(spark, rows)
    src = str(tmp_path / "src")
    # 3 sequential time-range files => watermark advances between triggers
    for j in range(3):
        df.where((F.col("value") >= 100 * j) & (F.col("value") < 100 * (j + 1))).coalesce(
            1
        ).write.mode("append").parquet(src)

    def side(kind):
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .where(F.col("event_type") == kind)
        )

    got = _drain(spark, side("view"), side("purchase"), str(tmp_path))
    want = {
        (r["user_id"], r["view_ts"], r["purchase_ts"])
        for r in attribute_purchases(
            df.where(F.col("event_type") == "view"),
            df.where(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == want and len(got) > 20


def test_streaming_join_evicts_view_state_behind_watermark(spark, tmp_path):
    """State BOUNDING, the property that makes the join run forever: a
    buffered view is evicted once the watermark passes view_ts + horizon,
    so a purchase arriving in a LATER batch can no longer match it —
    while a view still inside its horizon does match. (Two late rows in
    the SAME batch may legitimately join — no closed state is involved —
    so eviction, not input-drop, is the guaranteed semantics.)"""
    import datetime as dt
    import time

    base = dt.datetime(2026, 5, 1)
    src = str(tmp_path / "src")
    # batch 1: the view whose state must be evicted (hour 0) + high-ts rows
    # that push the watermark to hour 8 (10h - 2h delay)
    b1 = _rows(
        spark,
        [
            (2, base, 3.0, "view"),
            (1, base + dt.timedelta(hours=10), 1.0, "view"),
            (1, base + dt.timedelta(hours=10, minutes=5), 2.0, "purchase"),
        ],
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtime => deterministic file order
    # batch 2: filler — state removal runs during the first batch that
    # EXECUTES with the advanced watermark (eviction is end-of-batch
    # relative to the probe, so the probing purchase must come one later)
    b2 = _rows(spark, [(3, base + dt.timedelta(hours=10, minutes=10), 0.0, "view")])
    b2.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 3: a purchase 5 min after the evicted view — would match it
    # in a batch join, must NOT match here (state closed at wm > 1h)
    b3 = _rows(spark, [(2, base + dt.timedelta(minutes=5), 4.0, "purchase")])
    b3.coalesce(1).write.mode("append").parquet(src)

    def side(kind):
        return (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .where(F.col("event_type") == kind)
        )

    got = _drain(spark, side("view"), side("purchase"), str(tmp_path))
    users = {u for u, _, _ in got}
    assert 1 in users, "on-time pair must join"
    assert 2 not in users, "purchase matched a view the watermark evicted"
