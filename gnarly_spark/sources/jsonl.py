"""JSONL changelog source: the binlog/WAL tail as JSON lines, with
dead-letter routing for poison pills.

Why: production CDC feeds (Debezium/Maxwell/wal2json-style collectors — and
the reference's own ingestion, which pulls JSON blocks over RPC:
packages/gnarly-core/src/ingestion/Web3Api.ts:64-100 and normalizes them at
ingestion/Web3Api.ts:102-130) deliver JSON, not parquet. This source makes
the pipeline's source contract format-agnostic while keeping the one
property a 10^10-event tail cannot live without: a single malformed line
must never kill — or silently vanish from — the stream.

Scale shape:
- the scan is a TEXT scan (``spark.read.text`` / ``readStream.text``) and
  parsing is ``from_json`` — a map-side JVM expression under whole-stage
  codegen. Batch and streaming share one parser; file-split parallelism is
  identical to parquet; no Python, no shuffle.
- malformed JSON and type-mismatched fields land in ``_corrupt``
  (PERMISSIVE ``columnNameOfCorruptRecord``); structurally-valid rows
  missing required CDC fields (op_seq, op) are also dead-lettered. Dead
  letters keep the raw line so they can be replayed after an upstream fix.
- parsing via from_json over text (rather than a raw JSON file scan)
  sidesteps Spark's restriction on queries that reference only the
  internal corrupt-record column of a JSON scan — the dead-letter
  projection is exactly such a query.
- ``html`` (binary) travels base64 — JSON has no binary type; unbase64
  restores the exact bytes (round-trip byte-identical,
  tests/test_jsonl_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from gnarly_spark.fixtures import CHANGELOG_DDL

#: fields a changelog row cannot function without: op_seq is the total
#: order (U3) and op selects the reducer action; everything else is payload.
REQUIRED_FIELDS = ("op_seq", "op")

#: shared by writer and parser: Spark's default JSON timestamp format is
#: millisecond precision, which would silently truncate microsecond
#: warc_ts values in the round trip — pin microseconds on both sides.
JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def _parse_schema(schema: str) -> tuple[StructType, StructType, list[str]]:
    """DDL -> (parsed StructType, from_json schema with binary fields as
    base64 strings + _corrupt, names of the binary fields to restore) —
    ONE parse serves all three so the projection and the base64-restore
    set can never disagree."""
    st = StructType.fromDDL(schema)
    binary_cols = [f.name for f in st.fields if isinstance(f.dataType, BinaryType)]
    wire = StructType(
        [
            StructField(f.name, StringType()) if f.name in binary_cols else f
            for f in st.fields
        ]
    )
    wire = wire.add("_corrupt", StringType())
    return st, wire, binary_cols


def parse_changelog_jsonl(lines: DataFrame, schema: str = CHANGELOG_DDL) -> DataFrame:
    """Text lines (column ``value``) -> typed columns + ``_raw`` +
    ``_corrupt``. Works identically on a batch or streaming input — the
    split into events / dead letters happens in the two projections below
    (pure filters, so a streaming plan can apply both inside one
    foreachBatch without a second source scan)."""
    _, wire, _ = _parse_schema(schema)
    return lines.select(
        F.col("value").alias("_raw"),
        F.from_json(
            "value",
            wire,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt", **JSON_OPTS},
        ).alias("_r"),
    ).select("_raw", "_r.*")


def _required_ok():
    cond = F.col("_corrupt").isNull()
    for c in REQUIRED_FIELDS:
        cond = cond & F.col(c).isNotNull()
    return cond


def jsonl_events(parsed: DataFrame, schema: str = CHANGELOG_DDL) -> DataFrame:
    """The good rows, typed exactly to ``schema`` (binary columns restored
    from base64). Column order matches the DDL so downstream unions and
    MERGEs see the same shape as the parquet source."""
    st, _, binary_cols = _parse_schema(schema)
    cols = [
        F.unbase64(F.col(f.name)).alias(f.name) if f.name in binary_cols else F.col(f.name)
        for f in st.fields
    ]
    return parsed.where(_required_ok()).select(*cols)


def jsonl_dead_letters(parsed: DataFrame) -> DataFrame:
    """Rows that cannot enter the changelog, with the raw line and why:
    ``malformed`` (unparseable JSON or a type-mismatched field — Spark
    routes both to the corrupt column) vs ``missing_required`` (valid JSON
    lacking op_seq/op). Output: (raw, reason)."""
    reason = F.when(F.col("_corrupt").isNotNull(), F.lit("malformed")).otherwise(
        F.lit("missing_required")
    )
    return parsed.where(~_required_ok()).select(
        F.col("_raw").alias("raw"), reason.alias("reason")
    )


def read_changelog_jsonl(
    spark: SparkSession, path: str, schema: str = CHANGELOG_DDL
) -> DataFrame:
    """Bounded batch read of a JSONL changelog dir -> parsed relation
    (feed to jsonl_events / jsonl_dead_letters)."""
    return parse_changelog_jsonl(spark.read.text(path), schema)


def stream_changelog_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = CHANGELOG_DDL,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Unbounded tail of a JSONL changelog dir with file-count backpressure
    (same O3 contract as sources.changelog.stream_changelog)."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_changelog_jsonl(reader.text(path), schema)


def write_changelog_jsonl(
    events: DataFrame, path: str, n_files: int | None = None, mode: str = "overwrite"
) -> None:
    """Serialize a typed changelog DataFrame as JSON lines (binary columns
    base64-encoded) — the fixture/export half of the round trip. One text
    file per partition; ``n_files`` coalesces for deterministic micro-batch
    tests."""
    binary_cols = [f.name for f in events.schema.fields if isinstance(f.dataType, BinaryType)]
    cols = [
        F.base64(F.col(c)).alias(c) if c in binary_cols else F.col(c)
        for c in events.columns
    ]
    out = events.select(F.to_json(F.struct(*cols), JSON_OPTS).alias("value"))
    if n_files:
        out = out.coalesce(n_files)
    out.write.mode(mode).text(path)
