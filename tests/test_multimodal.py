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


def test_real_decode_still_stubbed_for_sample_data(spark, media):
    # formats with no header parser (sample/frame decode needs ffmpeg)
    with pytest.raises(Exception, match="NotImplementedError|needs ffmpeg"):
        extract_media_features(
            media.where("media_type = 'application/octet-stream'"),
            decode_real=True,
        ).collect()
    # payloads with a sniffable magic but no parseable header fail loudly
    for mt in ("image/jpeg", "audio/wav", "video/mp4"):
        with pytest.raises(Exception, match="undecodable"):
            extract_media_features(
                media.where(f"media_type = '{mt}'"), decode_real=True
            ).collect()


def _png_bytes(w, h, color_type=6, depth=8):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color_type, 0, 0, 0])
        + b"\x00" * 8  # fake CRC + next-chunk bytes
    )


def _jpeg_bytes(w, h, sof=0xC0, ncomp=3, pre_segments=b""):
    sof_seg = (
        bytes([0xFF, sof])
        + (8 + 3 * ncomp).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"\x01\x11\x00" * ncomp
    )
    return b"\xff\xd8" + pre_segments + sof_seg + b"\xff\xd9"


def test_image_header_decode_real_formats():
    """Pure-Python JPEG SOF / PNG IHDR parsing over realistic header
    shapes: APPn+COM segments before the SOF, progressive SOF2, fill
    bytes, grayscale and 16-bit PNG — plus garbage rejection."""
    from gnarly_spark.operators.multimodal import decode_image_header

    # baseline JPEG with APP0 + comment before SOF0
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe\x00\x07hello"
    assert decode_image_header(
        _jpeg_bytes(1920, 1080, pre_segments=app0 + com)
    ) == (1920, 1080, 3, 8)
    # progressive (SOF2), grayscale, fill bytes before the marker
    assert decode_image_header(
        _jpeg_bytes(640, 480, sof=0xC2, ncomp=1, pre_segments=b"\xff" + app0)
    ) == (640, 480, 1, 8)
    # PNG RGBA / grayscale / 16-bit
    assert decode_image_header(_png_bytes(800, 600)) == (800, 600, 4, 8)
    assert decode_image_header(_png_bytes(32, 32, color_type=0)) == (32, 32, 1, 8)
    assert decode_image_header(_png_bytes(5, 7, color_type=2, depth=16)) == (
        5, 7, 3, 16,
    )
    # rejects: zero-dim GIF, truncation, DHT-only JPEG, empty
    assert decode_image_header(b"GIF89a" + b"\x00" * 40) is None
    assert decode_image_header(_png_bytes(800, 600)[:20]) is None
    assert decode_image_header(b"\xff\xd8\xff\xc4\x00\x04\x00\x00\xff\xd9") is None
    assert decode_image_header(None) is None and decode_image_header(b"") is None


def _webp_bytes(chunk: bytes, payload: bytes) -> bytes:
    body = b"WEBP" + chunk + len(payload).to_bytes(4, "little") + payload
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_image_header_decode_gif_and_webp_variants():
    """GIF LSD (LE dims, color-resolution bits) and all three WebP
    container flavors: VP8X extended (24-bit LE minus-one dims, alpha
    flag), VP8L lossless (14-bit packed minus-one dims, alpha bit 28),
    VP8 lossy (keyframe start code, 14-bit LE dims)."""
    from gnarly_spark.operators.multimodal import decode_image_header

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert decode_image_header(gif + bytes([0x70, 0, 0])) == (320, 200, 3, 8)
    assert decode_image_header(gif + bytes([0x30, 0, 0])) == (320, 200, 3, 4)

    vp8x = lambda flags, w, h: _webp_bytes(
        b"VP8X",
        bytes([flags]) + b"\x00" * 3
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"),
    )
    assert decode_image_header(vp8x(0x00, 1024, 768)) == (1024, 768, 3, 8)
    assert decode_image_header(vp8x(0x10, 64, 64)) == (64, 64, 4, 8)

    bits = (333 - 1) | ((77 - 1) << 14)  # no alpha (bit 28 clear)
    assert decode_image_header(
        _webp_bytes(b"VP8L", bytes([0x2F]) + bits.to_bytes(4, "little") + b"\x00")
    ) == (333, 77, 3, 8)
    bits_a = bits | (1 << 28)
    assert decode_image_header(
        _webp_bytes(b"VP8L", bytes([0x2F]) + bits_a.to_bytes(4, "little") + b"\x00")
    ) == (333, 77, 4, 8)

    vp8 = _webp_bytes(
        b"VP8 ",
        b"\x00\x00\x00"  # frame tag
        + b"\x9d\x01\x2a"
        + (480).to_bytes(2, "little") + (360).to_bytes(2, "little"),
    )
    assert decode_image_header(vp8) == (480, 360, 3, 8)
    # rejects: bad VP8L signature byte, missing VP8 start code, alien chunk
    assert decode_image_header(
        _webp_bytes(b"VP8L", bytes([0x30]) + bits.to_bytes(4, "little") + b"\x00")
    ) is None
    assert decode_image_header(
        _webp_bytes(b"VP8 ", b"\x00" * 10)
    ) is None
    assert decode_image_header(_webp_bytes(b"ANIM", b"\x00" * 10)) is None


def test_extract_image_dims_spark_path(spark):
    """The mapInPandas operator: typed dims for JPEG/PNG rows, NULLs for
    everything else, column-pruned before the Python boundary."""
    from gnarly_spark.operators.multimodal import extract_image_dims

    rows = [
        (0, _png_bytes(12, 34)),
        (1, _jpeg_bytes(56, 78)),
        (2, b"not an image at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = extract_image_dims(df).toPandas().set_index("doc_id").sort_index()
    assert got.loc[0].tolist() == ["png", 12, 34, 4, 8]
    assert got.loc[1].tolist() == ["jpeg", 56, 78, 3, 8]
    assert got.loc[2].isna().all() and got.loc[3].isna().all()


def _wav_bytes(seconds=2, channels=2, rate=44100, bits=24, pre_chunks=b""):
    byte_rate = rate * channels * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data = b"data" + (byte_rate * seconds).to_bytes(4, "little")
    body = pre_chunks + fmt + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _mp4_bytes(duration_ms=90_000, timescale=1000, v=0, pre_boxes=b""):
    dur = duration_ms * timescale // 1000
    if v == 0:
        mvhd = b"\x00" * 4 + b"\x00" * 8 + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
    else:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big")
    mvhd_box = (8 + len(mvhd)).to_bytes(4, "big") + b"mvhd" + mvhd
    moov = (8 + len(mvhd_box)).to_bytes(4, "big") + b"moov" + mvhd_box
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 4
    return ftyp + pre_boxes + moov


def test_av_container_metadata_decode():
    """WAV chunk walk (word alignment, junk chunks before fmt) and MP4 box
    walk (free boxes before moov, v0 AND v1 mvhd, non-1000 timescales) —
    plus garbage rejection."""
    from gnarly_spark.operators.multimodal import _mp4_duration, _wav_header

    assert _wav_header(_wav_bytes()) == (2000, 2, 44100, 24)
    # odd-sized junk chunk before fmt exercises word alignment
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    assert _wav_header(_wav_bytes(seconds=1, channels=1, rate=8000, bits=16,
                                  pre_chunks=junk)) == (1000, 1, 8000, 16)
    assert _wav_header(b"RIFF\x00\x00\x00\x00AVI " + b"x" * 40) is None
    assert _wav_header(_wav_bytes()[:30]) is None

    assert _mp4_duration(_mp4_bytes()) == (90_000, 1000)
    assert _mp4_duration(_mp4_bytes(duration_ms=1500, timescale=600, v=1)) == (1500, 600)
    free = (12).to_bytes(4, "big") + b"free" + b"\x00" * 4
    assert _mp4_duration(_mp4_bytes(pre_boxes=free)) == (90_000, 1000)
    # 64-bit largesize moov (size field == 1, real size in the next 8
    # bytes; header is 16 bytes) — children start at +16, not +8
    dur = 90_000
    mvhd = b"\x00" * 4 + b"\x00" * 8 + (1000).to_bytes(4, "big") + dur.to_bytes(4, "big")
    mvhd_box = (8 + len(mvhd)).to_bytes(4, "big") + b"mvhd" + mvhd
    big_moov = (
        (1).to_bytes(4, "big") + b"moov"
        + (16 + len(mvhd_box)).to_bytes(8, "big") + mvhd_box
    )
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00\x00\x00\x00"
    assert _mp4_duration(ftyp + big_moov) == (90_000, 1000)
    assert _mp4_duration(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00") is None  # no moov
    assert _mp4_duration(b"not a video") is None


def test_extract_av_metadata_spark_path(spark):
    from gnarly_spark.operators.multimodal import extract_av_metadata

    rows = [(0, _wav_bytes()), (1, _mp4_bytes(duration_ms=7500)), (2, b"junk"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = extract_av_metadata(df).toPandas().set_index("doc_id").sort_index()
    assert got.loc[0].tolist() == ["wav", 2000, 2, 44100, 24]
    assert got.loc[1].fmt == "mp4" and got.loc[1].duration_ms == 7500
    assert got.loc[1][["channels", "sample_rate", "bit_depth"]].isna().all()
    assert got.loc[2].isna().all() and got.loc[3].isna().all()
    # decode_real features now real for wav/mp4 too
    av = spark.createDataFrame(
        [(0, "audio/wav", _wav_bytes()), (1, "video/mp4", _mp4_bytes(duration_ms=7500))],
        "doc_id long, media_type string, payload binary",
    )
    feats = (
        extract_media_features(av, decode_real=True)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert feats.loc[0, "feature"][:4].tolist() == [2000.0, 2.0, 44100.0, 24.0]
    assert feats.loc[1, "feature"][:2].tolist() == [7500.0, 1000.0]


def test_decode_real_features_carry_dims(spark):
    """decode_real=True on JPEG/PNG returns REAL dimensions in
    feature[0:4] while the sha tail still proves payload identity."""
    rows = [(0, "image/png", _png_bytes(100, 50)), (1, "image/jpeg", _jpeg_bytes(20, 10))]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = (
        extract_media_features(df, decode_real=True)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "feature"][:4].tolist() == [100.0, 50.0, 4.0, 8.0]
    assert got.loc[1, "feature"][:4].tolist() == [20.0, 10.0, 3.0, 8.0]
    fake = extract_media_features(df).toPandas().set_index("doc_id")
    for i in (0, 1):
        assert got.loc[i, "feature"][4:].tolist() == fake.loc[i, "feature"][4:].tolist()


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


# ---------------------------------------------------------------------------
# ffmpeg-backed A/V frame decode (optional binary; VERDICT r03 ask #4)
# ---------------------------------------------------------------------------


def _fake_ffmpeg(tmp_path):
    """A PATH-shadowing ffmpeg that emits deterministic streams: audio ->
    16000 s16le samples of amplitude 16384 (RMS 0.5); video -> a stream
    line '320x240, 25 fps' + 10 gray frames of value 128. Exercises the
    real subprocess + parser code without the real binary."""
    import stat
    import textwrap

    d = tmp_path / "bin"
    d.mkdir()
    sh = d / "ffmpeg"
    sh.write_text(
        textwrap.dedent(
            """\
            #!/bin/bash
            if [[ "$*" == *s16le* ]]; then
              python3 -c "import sys,struct; sys.stdout.buffer.write(struct.pack('<h', 16384) * 16000)"
            else
              echo "  Stream #0:0: Video: h264 (High), yuv420p, 320x240, 25 fps, 25 tbr" >&2
              python3 -c "import sys; sys.stdout.buffer.write(bytes([128]) * (64*64*10))"
            fi
            """
        )
    )
    sh.chmod(sh.stat().st_mode | stat.S_IEXEC)
    return str(d)


def test_ffmpeg_parsers_with_fake_binary(tmp_path, monkeypatch):
    from gnarly_spark.operators.multimodal import (
        _ffmpeg_audio,
        _ffmpeg_video,
        ffmpeg_available,
    )

    import os

    monkeypatch.setenv("PATH", _fake_ffmpeg(tmp_path) + ":" + os.environ["PATH"])
    assert ffmpeg_available()
    dur, n, rms, trunc = _ffmpeg_audio(b"RIFFfake")
    assert n == 16000 and dur == 1.0 and abs(rms - 0.5) < 1e-6 and not trunc
    # dims/fps come from the stream line; frames from the SCALED raster
    n_frames, w, h, luma, fps, vtrunc = _ffmpeg_video(b"fakemp4")
    assert (n_frames, w, h, fps) == (10, 320, 240, 25.0)
    assert abs(luma - 128 / 255.0) < 1e-6 and not vtrunc


def _fake_ffmpeg_cover_art(tmp_path):
    """A PATH-shadowing ffmpeg imitating an audio file with embedded cover
    art: video stream 0 is a 600x600 mjpeg '(attached pic)' (decodes to
    ONE frame), stream 1 is the real 320x240 h264 at 25 fps (decodes to
    10 frames). Both stream lines appear in every stderr dump, as real
    ffmpeg prints the full input dump regardless of -map."""
    import stat
    import textwrap

    d = tmp_path / "bin"
    d.mkdir()
    sh = d / "ffmpeg"
    sh.write_text(
        textwrap.dedent(
            """\
            #!/bin/bash
            echo "  Stream #0:0: Video: mjpeg (Baseline), yuvj420p, 600x600 [SAR 1:1 DAR 1:1], 90k tbr (attached pic)" >&2
            echo "  Stream #0:1: Video: h264 (High), yuv420p, 320x240, 25 fps, 25 tbr" >&2
            echo "Stream mapping:" >&2
            echo "Output #0, rawvideo, to 'pipe:1':" >&2
            echo "  Stream #0:0: Video: rawvideo, gray, 64x64, q=2-31, 25 fps" >&2
            if [[ "$*" == *0:v:1* ]]; then
              python3 -c "import sys; sys.stdout.buffer.write(bytes([128]) * (64*64*10))"
            else
              python3 -c "import sys; sys.stdout.buffer.write(bytes([255]) * (64*64*1))"
            fi
            """
        )
    )
    sh.chmod(sh.stat().st_mode | stat.S_IEXEC)
    return str(d)


def _fake_ffmpeg_cover_only(tmp_path):
    """An audio container whose ONLY video stream is the attached cover:
    the fallback must keep the 0:v:0 decode and report the cover's dims —
    and must NOT mistake the Output-section rawvideo line for a second
    input stream (it carries no 'attached pic' marker)."""
    import stat
    import textwrap

    d = tmp_path / "bin"
    d.mkdir()
    sh = d / "ffmpeg"
    sh.write_text(
        textwrap.dedent(
            """\
            #!/bin/bash
            echo "  Stream #0:1: Video: mjpeg (Baseline), yuvj420p, 600x600, 90k tbr (attached pic)" >&2
            echo "Stream mapping:" >&2
            echo "Output #0, rawvideo, to 'pipe:1':" >&2
            echo "  Stream #0:0: Video: rawvideo, gray, 64x64, q=2-31, 25 fps" >&2
            if [[ "$*" == *0:v:1* ]]; then
              echo "Stream map '0:v:1' matches no streams." >&2
              exit 1
            fi
            python3 -c "import sys; sys.stdout.buffer.write(bytes([255]) * (64*64*1))"
            """
        )
    )
    sh.chmod(sh.stat().st_mode | stat.S_IEXEC)
    return str(d)


def test_ffmpeg_video_skips_attached_pic_stream(tmp_path, monkeypatch):
    """Cover-art-bearing files must report the REAL video stream's dims
    and frames, not the thumbnail's (ADVICE r04: attached_pic is 0:v:0)."""
    import os

    from gnarly_spark.operators.multimodal import _ffmpeg_video

    monkeypatch.setenv(
        "PATH", _fake_ffmpeg_cover_art(tmp_path) + ":" + os.environ["PATH"]
    )
    n_frames, w, h, luma, fps, trunc = _ffmpeg_video(b"fakemp3withcover")
    assert (n_frames, w, h, fps) == (10, 320, 240, 25.0)
    assert abs(luma - 128 / 255.0) < 1e-6 and not trunc


def test_ffmpeg_video_cover_only_container_keeps_cover(tmp_path, monkeypatch):
    """A cover-art-ONLY container decodes the cover (it IS the visual
    content) — and the Output-section rawvideo line in stderr must not be
    miscounted as a second input stream (that -map would fail)."""
    import os

    from gnarly_spark.operators.multimodal import _ffmpeg_video

    monkeypatch.setenv(
        "PATH", _fake_ffmpeg_cover_only(tmp_path) + ":" + os.environ["PATH"]
    )
    n_frames, w, h, luma, fps, trunc = _ffmpeg_video(b"fakemp3coveronly")
    assert (n_frames, w, h) == (1, 600, 600)
    assert abs(luma - 1.0) < 1e-6 and not trunc


def test_extract_av_frames_requires_ffmpeg(spark, tmp_path, monkeypatch):
    """Degrades loudly and at plan-build time when the binary is absent."""
    import pytest as _pytest

    from gnarly_spark.operators.multimodal import extract_av_frames

    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    df = spark.createDataFrame(
        [(1, "audio/wav", b"x")], "doc_id long, media_type string, payload binary"
    )
    with _pytest.raises(RuntimeError, match="ffmpeg"):
        extract_av_frames(df)


def test_extract_av_frames_real_ffmpeg(spark, tmp_path):
    """Full Spark path with the REAL binary: synthesized WAV (stdlib wave)
    and ffmpeg-generated MP4 decode to verified durations. Skips cleanly
    where ffmpeg is not installed (this sandbox) — the r03 'done' shape."""
    import math
    import struct
    import subprocess
    import wave

    import pytest as _pytest

    from gnarly_spark.operators.multimodal import extract_av_frames, ffmpeg_available

    if not ffmpeg_available():
        _pytest.skip("ffmpeg not on PATH")
    # 0.5 s 440 Hz sine at 8 kHz mono
    wav_path = tmp_path / "t.wav"
    with wave.open(str(wav_path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(
            b"".join(
                struct.pack("<h", int(12000 * math.sin(2 * math.pi * 440 * i / 8000)))
                for i in range(4000)
            )
        )
    mp4_path = tmp_path / "t.mp4"
    subprocess.run(
        ["ffmpeg", "-hide_banner", "-f", "lavfi", "-i",
         "testsrc=duration=1:size=64x64:rate=10", "-pix_fmt", "yuv420p",
         str(mp4_path)],
        check=True, capture_output=True,
    )
    rows = [
        (1, "audio/wav", wav_path.read_bytes()),
        (2, "video/mp4", mp4_path.read_bytes()),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {r.doc_id: r for r in extract_av_frames(df).collect()}
    assert abs(got[1].duration_s - 0.5) < 0.05 and got[1].duration_verified
    assert got[1].level > 0.1  # sine RMS, not silence
    assert got[2].n_frames == 10 and (got[2].width, got[2].height) == (64, 64)
    assert got[2].duration_verified
