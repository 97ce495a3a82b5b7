"""WARC source/sink: Common-Crawl's native archive format as a Spark table.

Why: the north rule's payload is Common-Crawl-style web pages. Real crawl
data does not arrive as parquet — it lands as WARC segment files (ISO
28500: framed records of headers + raw HTTP payload). This module makes
WARC a first-class boundary format so the engine ingests a crawl directly:

    read_warc(spark, "s3://crawl/segments/*.warc.gz")   # batch backfill
    read_warc_stream(spark, landing_dir)                # tail new segments

Scale shape:
- the scan is Spark's ``binaryFile`` source — one row per file, so
  parallelism = number of segment files (Common Crawl ships ~64k ~1 GB
  files per crawl: tens of thousands of natural splits; the writer below
  emits one file per partition for the same reason). File listing,
  scheduling, and streaming-file tracking are all the built-in source's.
- parsing runs in ``mapInPandas`` (Arrow batches of whole files, pure
  byte-slicing, no per-record Python object churn beyond the record loop);
  nothing shuffles — parse is map-side and the first shuffle belongs to
  whatever query consumes the records.
- per-file gzip (.gz suffix) is decompressed in the same task. Member-level
  gzip (Common Crawl's record-per-member layout) also decompresses with
  zlib's multi-member loop — handled transparently by gzip.decompress.

The reference ingests framed JSON blocks over RPC and normalizes them
(packages/gnarly-core/src/ingestion/Web3Api.ts:64-130); this is the same
boundary-normalization role for the web-page payload domain, re-expressed
as a distributed scan instead of a serial poll loop.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: parsed-record schema (timestamps NTZ: WARC-Date is wall-clock UTC and the
#: driver's tables are TIMESTAMP_NTZ — see CLAUDE.md)
WARC_RECORD_DDL = (
    "url string, warc_ts timestamp_ntz, payload binary, warc_file string"
)

_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"  # WARC 1.1 allows fractional seconds


#: WARC-Type -> payload Content-Type header (ISO 28500 / Common Crawl
#: conventions: response = raw HTTP, conversion = WET extracted text,
#: metadata = WAT JSON)
_CONTENT_TYPES = {
    "response": "application/http; msgtype=response",
    "conversion": "text/plain",
    "metadata": "application/json",
}


def warc_record_bytes(
    url: str, ts: datetime, payload: bytes, record_type: str = "response"
) -> bytes:
    """Render ONE WARC record (ISO 28500 framing: version line, named
    headers, blank line, Content-Length payload bytes, two CRLFs).
    ``record_type='conversion'`` renders the WET (extracted-text) flavor."""
    import hashlib

    if record_type not in _CONTENT_TYPES:  # fail fast, not per-task KeyError
        raise ValueError(
            f"record_type {record_type!r} not in {sorted(_CONTENT_TYPES)}"
        )
    date = ts.strftime(_DATE_FMT)
    # record_type in the hash: a capture's response record and its WET
    # conversion twin must have DISTINCT record ids (ISO 28500 uniqueness)
    rec_id = hashlib.md5(f"{url}|{date}|{record_type}".encode()).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {_CONTENT_TYPES[record_type]}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
    compress: bool = False,
    record_type: str = "response",
    member_gzip: bool = False,
) -> list[tuple[str, int]]:
    """Distributed WARC writer: each partition streams its rows into ONE
    segment file ``part-NNNNN.warc[.gz]`` under ``path`` (the Common-Crawl
    layout: segment count == partition count, so a 1000-executor cluster
    writes 1000 segments concurrently; repartition upstream to choose).
    Returns the manifest [(file, n_records)] — file lists are driver-side
    metadata by design, never row data.

    ``member_gzip=True`` (implies compress) writes Common Crawl's actual
    record-per-gzip-member layout AND a ``part-NNNNN.cdx`` sidecar index
    (one line per record: 14-digit timestamp + JSON with url, filename,
    member offset/length, md5 digest — the CDX-J shape) — the layout that
    makes single-record RANGED reads possible (fetch_warc_records): a
    consumer with pointers reads length bytes at offset instead of
    decompressing the segment. gzip.decompress is multi-member, so the
    whole-file readers (read_warc/read_wet) consume either layout
    unchanged."""
    import json as _json
    import os

    from pyspark import TaskContext

    if record_type not in _CONTENT_TYPES:  # driver-side, before the job
        raise ValueError(
            f"record_type {record_type!r} not in {sorted(_CONTENT_TYPES)}"
        )
    if member_gzip:
        compress = True
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    sel = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.col(payload_col).alias("payload"),
    )

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{ext}")
        # attempt id in the temp name: a speculative or zombie retry of the
        # same partition must not interleave writes into one .inprogress
        # file (os.replace of the first finisher would promote a corrupt
        # gzip stream); each attempt writes its own temp, the replace is
        # atomic, and a loser's leftover temp stays invisible to readers
        tmp = f"{fname}.{ctx.taskAttemptId()}.inprogress"
        cdxname = os.path.join(path, f"part-{pid:05d}.cdx")
        cdx_tmp = f"{cdxname}.{ctx.taskAttemptId()}.inprogress"
        n = 0
        # records STREAM to the open file handle — never a whole-segment
        # BytesIO (+ a second full copy in gzip.compress): a ~1 GB Common
        # Crawl segment held O(record), not 2-3 GB, per concurrent task.
        # mtime=0 keeps the gzip bytes deterministic. The .inprogress
        # rename makes a crashed task's partial file invisible to readers.
        cdx = open(cdx_tmp, "w") if member_gzip else None
        with open(tmp, "wb") as raw:
            sink = (
                raw
                if member_gzip or not compress
                else gzip.GzipFile(fileobj=raw, mode="wb", mtime=0)
            )
            try:
                for pdf in batches:
                    for url, ts, payload in zip(
                        pdf["url"], pdf["warc_ts"], pdf["payload"]
                    ):
                        pay = bytes(payload or b"")
                        rec = warc_record_bytes(
                            url, ts.to_pydatetime(), pay, record_type
                        )
                        if member_gzip:
                            member = gzip.compress(rec, mtime=0)
                            off = raw.tell()
                            raw.write(member)
                            cdx.write(
                                ts.strftime("%Y%m%d%H%M%S")
                                + " "
                                + _json.dumps(
                                    {
                                        "url": url,
                                        "filename": os.path.basename(fname),
                                        "offset": off,
                                        "length": len(member),
                                        "digest": hashlib.md5(pay).hexdigest(),
                                        "type": record_type,
                                    },
                                    sort_keys=True,
                                )
                                + "\n"
                            )
                        else:
                            sink.write(rec)
                        n += 1
            finally:
                if compress and not member_gzip:
                    sink.close()
                if cdx is not None:
                    cdx.close()
        if n:
            if member_gzip:
                # PAIR publish: the segment and its CDX sidecar must come
                # from ONE attempt — two racing attempts interleaving two
                # os.replace calls could commit segment A with index B
                # (row order differs across attempts after a shuffle, so
                # offsets differ and every ranged read mis-seeks). An
                # exclusive flock serializes publishers: each finishing
                # attempt replaces BOTH files wholesale inside the lock,
                # so the committed pair is always one attempt's coherent
                # (segment, index). The kernel releases the lock if a
                # publisher dies mid-pair, and the next attempt's
                # wholesale republish heals the half-published state.
                # Re-running write_warc into an existing dir therefore
                # atomically republishes the pair — the same overwrite
                # semantics as the non-member path (ADVICE r03: the old
                # O_EXCL create-once lock made every rerun keep the OLD
                # bytes while reporting the NEW counts). flock is local-FS
                # scoped, matching this writer (a shared-nothing object
                # store would use a rename-manifest commit instead).
                #
                # Order INSIDE the pair matters too (ADVICE r04): flock
                # serializes writers but not readers, so a reader can
                # land between the two os.replace calls. Segment FIRST,
                # index LAST: a reader holding the not-yet-replaced OLD
                # index seeks into the new segment and fails the gzip
                # member header / digest check loudly (fetch_warc_records
                # verifies and retries), whereas the old index-first
                # order could hand a NEW index over the OLD shorter
                # segment — offsets past EOF or mid-member reads.
                import fcntl

                lockfd = os.open(fname + ".pub", os.O_CREAT | os.O_RDWR)
                fcntl.flock(lockfd, fcntl.LOCK_EX)
                try:
                    os.replace(tmp, fname)
                    os.replace(cdx_tmp, cdxname)
                finally:
                    fcntl.flock(lockfd, fcntl.LOCK_UN)
                    os.close(lockfd)
            else:
                os.replace(tmp, fname)
            yield pd.DataFrame({"file": [fname], "n_records": [n]})
        else:
            os.remove(tmp)
            if member_gzip:
                os.remove(cdx_tmp)

    manifest = sel.mapInPandas(write_part, "file string, n_records long").collect()
    return [(r["file"], r["n_records"]) for r in manifest]


#: CDX-J sidecar schema (read_cdx): pointer rows for ranged record access
CDX_DDL = (
    "url string, cdx_ts timestamp_ntz, filename string, offset long, "
    "length long, digest string, type string"
)


def read_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan CDX sidecar files -> pointer relation (CDX_DDL). This is the
    Common-Crawl index-read pattern: the CDX relation is ~100 bytes/record
    where the segments are ~KBs-MBs/record, so selection (by url, host,
    time window — add ``surt_key(col)`` from functions/url.py for the
    CC-style range key) runs on the tiny relation and only the matched
    records' bytes are ever fetched. Pure JVM: text scan + split +
    from_json."""
    lines = spark.read.text(path_glob)
    j = F.expr("substring(value, 16)")
    meta = F.from_json(
        j,
        "url string, filename string, offset long, length long, "
        "digest string, type string",
    )
    return lines.select(
        meta.getField("url").alias("url"),
        F.to_timestamp(F.expr("substring(value, 1, 14)"), "yyyyMMddHHmmss")
        .cast("timestamp_ntz")
        .alias("cdx_ts"),
        meta.getField("filename").alias("filename"),
        meta.getField("offset").alias("offset"),
        meta.getField("length").alias("length"),
        meta.getField("digest").alias("digest"),
        meta.getField("type").alias("type"),
    )


def fetch_warc_records(
    spark: SparkSession, pointers: DataFrame, segments_dir: str
) -> DataFrame:
    """RANGED record fetch: read exactly the records a CDX pointer
    relation selects — seek(offset), read(length), decompress ONE gzip
    member, parse one record — instead of decompressing whole segments.

    This is how Common Crawl is actually consumed selectively (the
    cluster.idx / cdx-*.gz two-step): a 1000-url sample out of a 64k-file
    crawl touches ~1000 * length bytes, not 64 TB. Pointers are
    repartitioned by filename and offset-sorted inside each partition, so
    a task's reads against one segment are sequential-ish and each file
    opens once per run of consecutive pointers. Output: WARC_RECORD_DDL
    (url, warc_ts, payload, warc_file) — identical to read_warc, so
    everything downstream is source-agnostic."""
    import os

    has_digest = "digest" in pointers.columns
    cols = ["filename", "offset", "length"] + (["digest"] if has_digest else [])
    sel = pointers.select(*cols).repartition(
        F.col("filename")
    ).sortWithinPartitions("filename", "offset")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import time
        import zlib

        # bounded emission: a 10k-pointer Arrow batch of MB-sized records
        # must NOT accumulate into one giant list + pandas copy (the same
        # O(record)-not-O(segment) memory rule write_warc streams under)
        flush_rows, flush_bytes = 256, 64 << 20
        fh, fh_name = None, None
        rows: list = []
        nbytes = 0
        try:
            for pdf in batches:
                digests = pdf["digest"] if has_digest else [None] * len(pdf)
                for fn, off, ln, dg in zip(
                    pdf["filename"], pdf["offset"], pdf["length"], digests
                ):
                    full = os.path.join(segments_dir, fn)
                    # Torn-pair tolerance (ADVICE r04): write_warc's flock
                    # serializes PUBLISHERS, but a reader can still land
                    # between the segment and index replaces, or hold a
                    # pointer row read before a wholesale republish. Such
                    # a stale pointer seeks into bytes that aren't the
                    # member it named — surfacing as a gzip header/CRC
                    # error, a parse error, or (worst case: a valid but
                    # WRONG member) a digest mismatch vs the CDX md5.
                    # All three retry with a reopened handle — the window
                    # is two renames wide, so one republish settles it —
                    # and fail loud after bounded attempts.
                    parsed = None
                    last_err: Exception | None = None
                    for attempt in range(3):
                        try:
                            if fh_name != full or attempt:
                                if fh is not None:
                                    fh.close()
                                fh = open(full, "rb")
                                fh_name = full
                            fh.seek(int(off))
                            blob = gzip.decompress(fh.read(int(ln)))
                            # a member holds exactly one record, already
                            # selected by the pointer — parse it whatever
                            # its type (already_decompressed: the .gz name
                            # must not trigger a second decompress)
                            parsed = list(
                                _parse_warc_bytes(
                                    fn,
                                    blob,
                                    record_type=None,
                                    already_decompressed=True,
                                )
                            )
                            if dg is not None and any(
                                hashlib.md5(p).hexdigest() != dg
                                for _, _, p, _ in parsed
                            ):
                                raise ValueError(
                                    f"payload digest mismatch vs CDX for "
                                    f"{fn}@{off}"
                                )
                            break
                        except (OSError, EOFError, ValueError, zlib.error) as e:
                            last_err = e
                            parsed = None
                            if fh is not None:
                                fh.close()
                                fh, fh_name = None, None
                            time.sleep(0.05 * (attempt + 1))
                    if parsed is None:
                        raise RuntimeError(
                            f"ranged WARC fetch failed after retries: "
                            f"{fn}@{off}+{ln}"
                        ) from last_err
                    # warc_file is spelled exactly like read_warc's
                    # binaryFile path ("file:" + absolute path), so
                    # downstream joins/groupBys on warc_file are
                    # source-agnostic.
                    for url, ts, payload, _ in parsed:
                        rows.append((url, ts, payload, f"file:{full}"))
                        nbytes += len(payload)
                        if len(rows) >= flush_rows or nbytes >= flush_bytes:
                            yield pd.DataFrame(
                                rows,
                                columns=["url", "warc_ts", "payload", "warc_file"],
                            )
                            rows, nbytes = [], 0
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "payload", "warc_file"]
                )
        finally:
            if fh is not None:
                fh.close()

    return sel.mapInPandas(fetch, WARC_RECORD_DDL)


def _parse_warc_date(name: str, raw: str) -> datetime:
    """WARC 1.0 dates have second precision ('2017-01-01T00:00:00Z' — all
    real Common Crawl segments); WARC 1.1 allows fractional seconds (what
    this module's writer emits). Accept both, reject anything else loudly."""
    for fmt in (_DATE_FMT, "%Y-%m-%dT%H:%M:%SZ"):
        try:
            return datetime.strptime(raw, fmt)
        except ValueError:
            continue
    raise ValueError(f"{name}: unparseable WARC-Date {raw!r}")


def _parse_warc_bytes(
    name: str,
    blob: bytes,
    record_type: str | None = "response",
    already_decompressed: bool = False,
) -> Iterator[tuple]:
    """Yield (url, warc_ts, payload, file) from one WARC file's bytes.
    Framing walk: header block up to the blank line, Content-Length bytes
    of payload, record separator. Tolerates \\n-only line endings. Only
    records of ``record_type`` ('response' | 'conversion' | 'metadata')
    are emitted — the framing walk still steps over every record;
    ``record_type=None`` emits every record (the ranged-fetch path, where
    the CDX pointer already selected it; that path also sets
    ``already_decompressed`` since it gunzips the member itself)."""
    if name.endswith(".gz") and not already_decompressed:
        blob = gzip.decompress(blob)  # multi-member safe
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record whitespace
        while i < n and blob[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            break
        # take whichever terminator ends FIRST: an LF-only header block is
        # otherwise mis-framed by a \r\n\r\n further down in an HTTP payload
        e1 = blob.find(b"\r\n\r\n", i)
        e2 = blob.find(b"\n\n", i)
        if e1 != -1 and (e2 == -1 or e1 < e2):
            end, sep = e1, 4
        elif e2 != -1:
            end, sep = e2, 2
        else:
            raise ValueError(f"{name}: truncated WARC header block at byte {i}")
        headers = {}
        for line in blob[i:end].decode("utf-8", errors="replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = end + sep
        payload = blob[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(f"{name}: truncated payload at byte {body_start}")
        if record_type is None or headers.get("warc-type") == record_type:
            yield (
                headers["warc-target-uri"],
                _parse_warc_date(name, headers["warc-date"]),
                payload,
                name,
            )
        i = body_start + length


def _parse_files_for(record_type: str):
    def _parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for name, blob in zip(pdf["path"], pdf["content"])
                for rec in _parse_warc_bytes(name, bytes(blob), record_type)
            ]
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "payload", "warc_file"]
                )

    return _parse_files


_parse_files = _parse_files_for("response")  # the historical default


def read_warc(
    spark: SparkSession, path_glob: str, record_type: str = "response"
) -> DataFrame:
    """Batch scan of WARC segment files -> (url, warc_ts, payload,
    warc_file). One input row per file (binaryFile), parsed map-side."""
    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("path", "content").mapInPandas(
        _parse_files_for(record_type), WARC_RECORD_DDL
    )


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """Batch scan of WET files (Common Crawl's extracted-text flavor:
    ``WARC-Type: conversion`` records whose payload is UTF-8 plain text)
    -> (url, warc_ts, text, warc_file). Most text-pipeline users consume
    WET, not raw WARC — this is the direct path from a WET segment
    listing to the `documents`-shaped curation operators (dedup, DSIR,
    quality) without an HTML-extraction hop. Same binaryFile +
    mapInPandas shape as read_warc; the decode is JVM-side."""
    return read_warc(spark, path_glob, record_type="conversion").select(
        "url",
        "warc_ts",
        F.decode("payload", "utf-8").alias("text"),
        "warc_file",
    )


def crawl_to_changelog(records: DataFrame, block_seconds: int = 3600) -> DataFrame:
    """Adapt parsed WARC records to the engine's changelog contract
    (fixtures.CHANGELOG_DDL), so a raw crawl drives the full CDC pipeline:
    WARC segments -> changelog -> CdcIngestPipeline -> lake pages table.

    Crawl semantics: every fetch is an upsert of its url ('update' — the
    LWW replay needs no insert/update distinction); re-fetches resolve by
    (warc_ts, op_seq) last-writer-wins exactly like any other changelog.
    op_seq = microseconds-since-epoch of the fetch: unique PER URL (the
    exactly-once MERGE key is (url, op_seq) and LWW partitions by url, so
    cross-url equality is harmless) and monotone with crawl time. Blocks
    are wall-clock buckets of ``block_seconds`` — the retention/reorg unit;
    crawls don't fork, so revert_of_block is always NULL. Pure map-side
    column derivation: no shuffle, no Python."""
    ts = F.col("warc_ts").cast("timestamp")  # NTZ -> UTC instant (session TZ pinned)
    block_id = F.floor(F.unix_timestamp(ts) / block_seconds).cast("long")
    return records.select(
        F.unix_micros(ts).alias("op_seq"),
        block_id.alias("block_id"),
        block_id.cast("string").alias("block_hash"),
        (block_id - 1).cast("string").alias("parent_hash"),
        F.lit("update").alias("op"),
        "url",
        F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("revert_of_block"),
        F.lit("crawl").alias("reason"),
    )


def read_warc_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """Streaming tail of a WARC landing directory: new segment files become
    micro-batch rows via the file stream source (checkpointable, resumable,
    maxFilesPerTrigger backpressure — the same properties the changelog
    source has), parsed with the identical map-side parser."""
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's schema is fixed, but the STREAMING reader
        # refuses to infer — declare it verbatim
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(dir_path)
    )
    return files.select("path", "content").mapInPandas(
        _parse_files, WARC_RECORD_DDL
    )
