"""WARC source: framing round-trip, gzip, tolerance, truncation, streaming."""

from __future__ import annotations

import gzip
import os
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gnarly_spark.sources.warc import (
    _parse_warc_bytes,
    read_warc,
    read_warc_stream,
    warc_record_bytes,
    write_warc,
)


def _docs(spark, n=40):
    return spark.range(n).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_add(
            "SECOND", F.col("id"), F.lit("2026-03-01 12:00:00.5").cast("timestamp_ntz")
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>page "), F.col("id").cast("string")), "utf-8").alias(
            "payload"
        ),
    )


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_byte_identical(spark, compress, tmp_path):
    docs = _docs(spark)
    manifest = write_warc(docs.repartition(3), str(tmp_path), compress=compress)
    assert sum(n for _, n in manifest) == 40
    assert len(manifest) <= 3 and all(os.path.exists(f) for f, _ in manifest)
    glob = f"{tmp_path}/*.warc.gz" if compress else f"{tmp_path}/*.warc"
    back = read_warc(spark, glob)
    orig = {(r["url"], r["warc_ts"], bytes(r["payload"])) for r in docs.collect()}
    got = {(r["url"], r["warc_ts"], bytes(r["payload"])) for r in back.collect()}
    assert got == orig  # urls, microsecond timestamps, exact payload bytes


def test_warc_parser_tolerates_lf_only_and_skips_non_response():
    rec = warc_record_bytes(
        "https://a/1", datetime(2026, 3, 1, 0, 0, 0, 123456), b"BODY"
    )
    lf_only = rec.replace(b"\r\n", b"\n")
    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n"
    )
    out = list(_parse_warc_bytes("f.warc", meta + lf_only))
    assert out == [
        ("https://a/1", datetime(2026, 3, 1, 0, 0, 0, 123456), b"BODY", "f.warc")
    ]


def test_warc_10_second_precision_dates_parse():
    """Real Common Crawl segments are WARC 1.0: WARC-Date has NO fractional
    seconds. The parser must accept both forms (regression: strict %f-only
    strptime rejected every real crawl file)."""
    rec = warc_record_bytes("https://a/1", datetime(2026, 3, 1, 0, 0, 0, 123456), b"B")
    plain = rec.replace(b"2026-03-01T00:00:00.123456Z", b"2017-01-01T00:00:05Z")
    out = list(_parse_warc_bytes("cc.warc", plain))
    assert out == [("https://a/1", datetime(2017, 1, 1, 0, 0, 5), b"B", "cc.warc")]
    with pytest.raises(ValueError, match="unparseable WARC-Date"):
        list(_parse_warc_bytes("bad.warc", rec.replace(
            b"2026-03-01T00:00:00.123456Z", b"01 Mar 2026 00:00:00 GMT+0"
        )))


def test_warc_lf_only_header_with_crlf_in_payload():
    """An LF-only header block followed by a payload CONTAINING \\r\\n\\r\\n
    (every HTTP response does) must frame on the earlier \\n\\n terminator,
    not the payload's CRLFCRLF (regression: the fallback only fired when
    CRLFCRLF was absent from the entire remainder)."""
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    rec = warc_record_bytes("https://a/1", datetime(2026, 3, 1), body)
    lf_only_headers = rec.split(b"\r\n\r\n", 1)
    lf_rec = lf_only_headers[0].replace(b"\r\n", b"\n") + b"\n\n" + lf_only_headers[1]
    out = list(_parse_warc_bytes("f.warc", lf_rec))
    assert out == [("https://a/1", datetime(2026, 3, 1), body, "f.warc")]


def test_warc_parser_raises_on_truncation():
    rec = warc_record_bytes("https://a/1", datetime(2026, 1, 1), b"0123456789")
    with pytest.raises(ValueError, match="truncated payload"):
        list(_parse_warc_bytes("f.warc", rec[:-8]))  # payload cut short
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(_parse_warc_bytes("f.warc", rec[:20]))  # header block cut short


def test_warc_multi_member_gzip(tmp_path):
    # Common Crawl gzips each record as its own member; the reader must
    # decompress the whole member chain, not just the first
    r1 = warc_record_bytes("https://a/1", datetime(2026, 1, 1), b"one")
    r2 = warc_record_bytes("https://a/2", datetime(2026, 1, 2), b"two")
    blob = gzip.compress(r1) + gzip.compress(r2)
    urls = [u for u, _, _, _ in _parse_warc_bytes("f.warc.gz", blob)]
    assert urls == ["https://a/1", "https://a/2"]


def test_warc_streaming_tail(spark, tmp_path):
    land = str(tmp_path / "landing")
    docs = _docs(spark, 12)
    write_warc(docs.repartition(2), land, compress=True)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        read_warc_stream(spark, land)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 12
    # second drain with a NEW segment file only picks up the new file
    write_warc(_docs(spark, 5).repartition(1), land + "/late", compress=True)
    os.rename(
        land + "/late/part-00000.warc.gz", land + "/part-late.warc.gz"
    )
    q = (
        read_warc_stream(spark, land)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 17


def test_warc_crawl_drives_full_pipeline_end_to_end(spark, tmp_path):
    """Crawl in, lake out: WARC segments -> parsed records -> changelog
    adapter -> CdcIngestPipeline (streaming drain) -> pages table. The
    final table must be the per-url LWW of the crawl with the pipeline's
    own extraction applied to the winning payloads."""
    from pyspark.sql import Window

    from gnarly_spark.functions.extraction import extract_text_udf
    from gnarly_spark.sources.warc import crawl_to_changelog
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    # 30 urls; urls 0..14 re-fetched 1h later with different content
    first = _docs(spark, 30)
    refetch = _docs(spark, 15).select(
        "url",
        F.timestamp_add("HOUR", F.lit(1), F.col("warc_ts")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>REVISED "), F.col("url")), "utf-8").alias(
            "payload"
        ),
    )
    crawl_dir = str(tmp_path / "crawl")
    write_warc(first.repartition(2), crawl_dir, compress=True)
    write_warc(refetch.repartition(1), crawl_dir + "/b", compress=True)
    os.rename(crawl_dir + "/b/part-00000.warc.gz", crawl_dir + "/part-b.warc.gz")

    log = crawl_to_changelog(read_warc(spark, f"{crawl_dir}/*.warc.gz"))
    src = str(tmp_path / "changelog")
    log.repartition(3).write.parquet(src)

    p = CdcIngestPipeline(spark, str(tmp_path / "work"))
    q = p.start(src, available_now=True, max_files_per_trigger=1)
    q.awaitTermination()

    got = {
        (r["url"], r["warc_ts"], r["text"])
        for r in p.pages().select("url", "warc_ts", "text").collect()
    }
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    winners = (
        first.unionByName(refetch)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumnRenamed("payload", "html")
        .withColumn("text", extract_text_udf(F.col("html")))
    )
    want = {
        (r["url"], r["warc_ts"], r["text"])
        for r in winners.select("url", "warc_ts", "text").collect()
    }
    assert got == want and len(got) == 30


def test_wet_roundtrip_and_type_isolation(spark, tmp_path):
    """WET (conversion) records roundtrip through write_warc/read_wet;
    a mixed-type file yields response records to read_warc and conversion
    records to read_wet, never cross-contaminating."""
    from datetime import datetime

    from gnarly_spark.sources.warc import (
        read_warc,
        read_wet,
        warc_record_bytes,
        write_warc,
    )

    docs = spark.createDataFrame(
        [
            ("https://a.example/1", datetime(2026, 1, 1), b"hello text"),
            ("https://a.example/2", datetime(2026, 1, 2), "uni é".encode()),
        ],
        "url string, warc_ts timestamp_ntz, payload binary",
    )
    wet_dir = str(tmp_path / "wet")
    write_warc(docs, wet_dir, compress=True, record_type="conversion")
    back = {
        r["url"]: r["text"]
        for r in read_wet(spark, f"{wet_dir}/*.warc.gz").collect()
    }
    assert back == {
        "https://a.example/1": "hello text",
        "https://a.example/2": "uni é",
    }
    # read_warc (response) must see NOTHING in a conversion-only file
    assert read_warc(spark, f"{wet_dir}/*.warc.gz").count() == 0

    # hand-build a mixed file: one response + one conversion record
    mixed = tmp_path / "mixed" ; mixed.mkdir()
    blob = warc_record_bytes(
        "https://m.example/r", datetime(2026, 1, 3), b"<html>r</html>"
    ) + warc_record_bytes(
        "https://m.example/c", datetime(2026, 1, 3), b"r text", "conversion"
    )
    (mixed / "part-00000.warc").write_bytes(blob)
    glob = f"{mixed}/*.warc"
    assert [r["url"] for r in read_warc(spark, glob).collect()] == [
        "https://m.example/r"
    ]
    assert [r["url"] for r in read_wet(spark, glob).collect()] == [
        "https://m.example/c"
    ]


def test_member_gzip_layout_and_whole_file_read(spark, tmp_path):
    """member_gzip: record-per-member segments read back identically via
    the ordinary whole-file reader (multi-member decompress), and the CDX
    sidecar has one pointer per record with exact offsets/lengths."""
    from gnarly_spark.sources.warc import read_cdx

    docs = _docs(spark)
    manifest = write_warc(docs.repartition(3), str(tmp_path), member_gzip=True)
    assert sum(n for _, n in manifest) == 40
    back = read_warc(spark, f"{tmp_path}/*.warc.gz")
    assert back.count() == 40
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx").collect()
    assert len(cdx) == 40
    # pointers tile each segment exactly: offsets begin at 0 per file and
    # offset+length chains to the next member / the file size
    by_file: dict = {}
    for r in cdx:
        by_file.setdefault(r.filename, []).append((r.offset, r.length))
    for fn, spans in by_file.items():
        spans.sort()
        assert spans[0][0] == 0
        for (o1, l1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + l1 == o2
        assert spans[-1][0] + spans[-1][1] == os.path.getsize(
            os.path.join(str(tmp_path), fn)
        )


def test_cdx_ranged_fetch_matches_selection(spark, tmp_path):
    """Ranged fetch via CDX pointers returns exactly the selected records,
    byte-identical (payload + microsecond ts), without reading the rest."""
    from gnarly_spark.sources.warc import fetch_warc_records, read_cdx

    docs = _docs(spark, n=60)
    write_warc(docs.repartition(4), str(tmp_path), member_gzip=True)
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx")
    sel = cdx.where(F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") % 7 == 0)
    got = fetch_warc_records(spark, sel, str(tmp_path)).collect()
    want = {
        (r.url, r.warc_ts, bytes(r.payload))
        for r in docs.where(F.col("url").rlike(r"/p/\d+$")).collect()
        if int(r.url.rsplit("/", 1)[1]) % 7 == 0
    }
    assert {(r.url, r.warc_ts, bytes(r.payload)) for r in got} == want
    # digest agreement: the CDX digest is md5 of the payload bytes
    import hashlib

    dg = {r.url: r.digest for r in sel.collect()}
    for r in got:
        assert dg[r.url] == hashlib.md5(bytes(r.payload)).hexdigest()


def test_cdx_fetch_corrupt_pointer_fails_loud(spark, tmp_path):
    from gnarly_spark.sources.warc import fetch_warc_records, read_cdx

    docs = _docs(spark, n=10)
    write_warc(docs.repartition(1), str(tmp_path), member_gzip=True)
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx")
    bad = cdx.limit(1).withColumn("offset", F.col("offset") + 3)
    with pytest.raises(Exception):  # mid-member seek: not a gzip stream
        fetch_warc_records(spark, bad, str(tmp_path)).collect()


def test_cdx_fetch_digest_mismatch_fails_loud(spark, tmp_path):
    """A pointer that names a VALID gzip member but the wrong record (the
    torn-republish worst case: stale index over a new segment where an
    old offset happens to land on a member boundary) must not silently
    return the wrong bytes — the CDX md5 check rejects it after bounded
    retries (ADVICE r04)."""
    from gnarly_spark.sources.warc import fetch_warc_records, read_cdx

    docs = _docs(spark, n=6)
    write_warc(docs.repartition(1), str(tmp_path), member_gzip=True)
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx")
    # swap one pointer's digest for another record's: offset/length still
    # decode a clean member, so only the digest check can catch it
    two = cdx.orderBy("offset").limit(2).collect()
    bad = cdx.where(F.col("offset") == two[0]["offset"]).withColumn(
        "digest", F.lit(two[1]["digest"])
    )
    with pytest.raises(Exception, match="after retries"):
        fetch_warc_records(spark, bad, str(tmp_path)).collect()


def test_cdx_fetch_warc_file_spelling_matches_read_warc(spark, tmp_path):
    """fetch_warc_records spells warc_file exactly like read_warc's
    binaryFile path (file: + absolute path), so cross-source joins on
    warc_file work."""
    from gnarly_spark.sources.warc import fetch_warc_records, read_cdx

    docs = _docs(spark, n=8)
    write_warc(docs.repartition(1), str(tmp_path), member_gzip=True)
    whole = {r.warc_file for r in read_warc(spark, f"{tmp_path}/*.warc.gz").collect()}
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx")
    ranged = {
        r.warc_file for r in fetch_warc_records(spark, cdx, str(tmp_path)).collect()
    }
    assert ranged == whole  # identical spelling, joinable


def test_member_gzip_rerun_republishes_pair(spark, tmp_path):
    """ADVICE r03: re-running write_warc into an existing dir must
    atomically republish BOTH pair files with the new content (the old
    O_EXCL lock kept the stale segment+CDX while the manifest reported
    the new counts). Ranged fetch over the republished pair must still
    seek correctly — pair coherence from one attempt."""
    from gnarly_spark.sources.warc import fetch_warc_records, read_cdx

    d1 = _docs(spark, 10)
    write_warc(d1.repartition(1), str(tmp_path), member_gzip=True)
    d2 = _docs(spark, 25)  # different content, same output dir
    manifest = write_warc(d2.repartition(1), str(tmp_path), member_gzip=True)
    assert sum(n for _, n in manifest) == 25
    back = read_warc(spark, f"{tmp_path}/*.warc.gz")
    assert back.count() == 25  # new bytes actually published
    cdx = read_cdx(spark, f"{tmp_path}/*.cdx")
    assert cdx.count() == 25  # sidecar republished with the segment
    # ranged reads through the republished index hit exact members
    got = fetch_warc_records(spark, cdx.limit(5), str(tmp_path))
    assert got.count() == 5
