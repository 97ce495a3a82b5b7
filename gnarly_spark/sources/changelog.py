"""Changelog sources: batch and streaming readers over the CDC event table.

The reference tails a node over JSON-RPC (ingestion/Web3Api.ts, IngestApi
interface at ingestion/IngestApi.ts) with retries, memoization, longpoll and
a backpressured fast-forward loop (Blockstream.ts:95-131). Spark-side the
changelog is a TABLE, so:

- point/range lookups (S1-S4) are predicate-pushed scans, not RPCs;
- the 5 s longpoll (Web3Api.ts:92-100) is `trigger(processingTime=...)`;
- backfill fast-forward + its queue cap (Blockstream.ts:24,106-112) is
  `trigger(availableNow=True)` + `maxFilesPerTrigger`;
- retry/backoff (Web3Api.ts:57-60) is Spark task retry;
- the 1 s memo TTL (utils.ts:17-22) is unnecessary — one shared scan.

Readers accept parquet dirs here; on a deployment the same call sites take
an Iceberg table name (`spark.readStream.format("iceberg")...`) — the
pipeline only sees a DataFrame either way.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnarly_spark.fixtures import CHANGELOG_DDL


def order_files_by_name(path: str, pattern: str = "part-*") -> int:
    """Stamp file mtimes in name order so the file-stream source delivers
    micro-batches in op_seq order.

    Spark's FileStreamSource orders files by MODIFICATION TIME, not name; a
    changelog dir written by a parallel job has scrambled mtimes, so blocks
    would arrive out of order — violating the changelog's total-order
    contract (the pipeline fails fast when a batch lands beyond the
    retention window). Call this once after writing a changelog dir that
    will be tailed as a stream. Returns the number of files stamped.
    (A real deployment tails an ordered table — Iceberg incremental read /
    Kafka — where this concern does not exist.)
    """
    files = sorted(glob.glob(os.path.join(path, pattern)))
    base = time.time() - 2 * len(files) - 10
    for i, f in enumerate(files):
        os.utime(f, (base + 2 * i, base + 2 * i))
    return len(files)


def read_changelog(spark: SparkSession, path: str, schema: str = CHANGELOG_DDL) -> DataFrame:
    """Bounded batch read (backfill / full replay)."""
    return spark.read.schema(schema).parquet(path)


def stream_changelog(
    spark: SparkSession,
    path: str,
    schema: str = CHANGELOG_DDL,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Unbounded tail with file-count backpressure (O3 analog)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def block_by_seq(changelog: DataFrame, op_seq: int) -> DataFrame:
    """S1 getBlockByNumber analog — pushed-down point lookup."""
    return changelog.where(F.col("op_seq") == op_seq)


def block_by_hash(changelog: DataFrame, block_hash: str) -> DataFrame:
    """S2 getBlockByHash analog."""
    return changelog.where(F.col("block_hash") == block_hash)


def latest_seq(changelog: DataFrame):
    """S3 getLatestBlock analog (HEAD)."""
    return changelog.agg(F.max("op_seq").alias("head_seq"))


def events_in_range(changelog: DataFrame, lo: int, hi: int, url: str | None = None) -> DataFrame:
    """S4 getLogs analog — block-range + key filter, both pushed down."""
    out = changelog.where(F.col("op_seq").between(lo, hi))
    if url is not None:
        out = out.where(F.col("url") == url)
    return out
