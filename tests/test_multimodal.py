"""Multimodal plumbing tests: schema, magic sniffing, Arrow batch shapes,
deterministic stub features, byte-based partitioning, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gnarly_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    media_metadata,
    media_repartition_by_bytes,
    sample_frames,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"x" * 100
JPG = b"\xff\xd8\xff\xe0" + b"y" * 50
WAV = b"RIFF....WAVE" + b"z" * 200
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"m" * 300


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image/png", PNG),
        (1, "image/jpeg", JPG),
        (2, "audio/wav", WAV),
        (3, "video/mp4", MP4),
        (4, "application/octet-stream", b"\x00\x01"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, media_type string, payload binary")


def test_magic_sniffing(spark, media):
    got = media_metadata(media).select("doc_id", "sniffed_type", "n_bytes").toPandas()
    got = got.set_index("doc_id")
    assert got.loc[0, "sniffed_type"] == "image/png"
    assert got.loc[1, "sniffed_type"] == "image/jpeg"
    assert got.loc[2, "sniffed_type"] == "audio/wav"
    assert got.loc[3, "sniffed_type"] == "video/mp4"
    assert got.loc[4, "sniffed_type"] == "application/octet-stream"
    assert got.loc[0, "n_bytes"] == len(PNG)


def test_feature_extraction_shape_and_determinism(spark, media):
    got = extract_media_features(media).toPandas().set_index("doc_id")
    assert len(got) == 5
    assert all(len(v) == FEATURE_DIM for v in got.feature)
    again = extract_media_features(media).toPandas().set_index("doc_id")
    for i in range(5):
        assert list(got.loc[i, "feature"]) == list(again.loc[i, "feature"])
    assert got.loc[3, "n_bytes"] == len(MP4)


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_media_features(media, decode_real=True).collect()


def _partition_bytes(out):
    return [
        r.b
        for r in out.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg(F.sum(F.length("payload")).alias("b"))
        .collect()
    ]


def test_repartition_by_bytes(spark):
    rows = [(i, b"v" * 1024) for i in range(2048)]  # 2 MB total
    df = spark.createDataFrame(rows, schema="doc_id long, payload binary")
    out = media_repartition_by_bytes(df, target_mb=1)
    assert out.count() == 2048
    assert set(out.columns) == {"doc_id", "payload"}  # helper cols dropped
    # cumulative-bytes bucketing: no partition exceeds ~target
    assert max(_partition_bytes(out)) <= 2 * 1024 * 1024


def test_repartition_by_bytes_mixed_sizes_no_straggler(spark):
    """1 KB thumbnails mixed with 8 MB videos (the case the docstring
    promises to solve): a round-robin row-count split would pack several
    videos into one task; cumulative-byte bucketing must not — no
    partition holds more than one oversized row plus ~target of small."""
    rows = [(i, b"t" * 1024) for i in range(512)] + [
        (1000 + i, b"V" * (8 << 20)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, payload binary")
    out = media_repartition_by_bytes(df, target_mb=4)
    sizes = _partition_bytes(out)
    assert sum(sizes) == 512 * 1024 + 8 * (8 << 20)
    assert max(sizes) <= (8 << 20) + (4 << 20)
    # the 8 videos spread over >= 8 distinct partitions
    assert len([s for s in sizes if s >= (8 << 20)]) == 8


def test_repartition_by_bytes_string_ids(spark):
    """Non-numeric ids (string asset keys) chunk by xxhash64 mod
    ceil(rows/chunk_rows) instead of integer division — same byte-balance
    contract, any orderable id type."""
    rows = [(f"asset-{i:05d}", b"v" * 1024) for i in range(2048)] + [
        (f"big-{i}", b"V" * (4 << 20)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, schema="asset_id string, payload binary")
    out = media_repartition_by_bytes(df, id_col="asset_id", target_mb=2)
    assert out.count() == 2052
    sizes = _partition_bytes(out)
    assert sum(sizes) == 2048 * 1024 + 4 * (4 << 20)
    # no partition holds more than one oversized row plus ~target of small
    assert max(sizes) <= (4 << 20) + (2 << 20)
    with pytest.raises(ValueError, match="asset_id"):
        media_repartition_by_bytes(
            df.select("payload"), id_col="asset_id", target_mb=2
        )


def test_sample_frames(spark):
    df = spark.createDataFrame([(0, 3500), (1, 900)], "doc_id long, duration_ms long")
    got = sample_frames(df, every_ms=1000).toPandas()
    f0 = got[got.doc_id == 0].frame_ts_ms.tolist()
    assert f0 == [0, 1000, 2000, 3000]
    assert got[got.doc_id == 1].frame_ts_ms.tolist() == [0]


def test_riff_container_disambiguation(spark):
    """RIFF is a container: bytes 9-12 pick the concrete type — AVI video
    and WebP images must not masquerade as audio/wav (they'd hit the wrong
    decoder at deploy), and an unknown RIFF form stays octet-stream."""
    rows = [
        (0, b"RIFF...." + b"WAVE" + b"z" * 40),
        (1, b"RIFF...." + b"AVI " + b"v" * 40),
        (2, b"RIFF...." + b"WEBP" + b"w" * 40),
        (3, b"RIFF...." + b"WHAT" + b"?" * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = media_metadata(df).select("doc_id", "sniffed_type").toPandas().set_index("doc_id")
    assert got.loc[0, "sniffed_type"] == "audio/wav"
    assert got.loc[1, "sniffed_type"] == "video/avi"
    assert got.loc[2, "sniffed_type"] == "image/webp"
    assert got.loc[3, "sniffed_type"] == "application/octet-stream"


def test_sample_frames_skips_empty_media(spark):
    """NULL or non-positive duration yields NO frames — not a phantom
    ts=0 row handed to the frame decoder."""
    df = spark.createDataFrame(
        [(0, 2500), (1, 0), (2, None), (3, -5)], "doc_id long, duration_ms long"
    )
    got = sample_frames(df, every_ms=1000).toPandas()
    assert got.doc_id.unique().tolist() == [0]
    assert got.frame_ts_ms.tolist() == [0, 1000, 2000]
