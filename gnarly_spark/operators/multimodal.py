"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines at 100 TB carry media as `binary` columns with a
struct of metadata, and run decode / feature-extract / resize / frame-sample
as Arrow-batched pandas functions over `mapInPandas`. The Spark-side
plumbing here — schemas, batch iteration, partition sizing, deterministic
fake features — is real and tested; the actual codec calls are STUBBED
(`NotImplementedError` behind `decode_real=True`) because no image/audio
libraries exist in this container. Swapping in PIL/ffmpeg at deploy time
changes only the inside of `_decode_stub`.

Scale notes:
- media rows are large; `media_repartition_by_bytes` sizes partitions by
  payload bytes (not row count) so one task never holds > target_mb of
  media — row-count-based splits melt on mixed thumbnail/video tables.
- all per-row work is inside `mapInPandas` (one Python worker per task,
  Arrow zero-copy batches), never per-row Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, duration_ms long, codec string"
)

FEATURE_DIM = 16

FEATURES_DDL = f"doc_id long, media_type string, n_bytes long, feature array<float>"


def media_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: size + magic-byte sniffing (no decode).

    Magic numbers: PNG \\x89PNG, JPEG \\xff\\xd8, 'ftyp' mp4, and RIFF —
    which is a generic CONTAINER, so bytes 9-12 pick the concrete type
    (WAVE -> audio/wav, 'AVI ' -> video/avi, WEBP -> image/webp); an
    unknown RIFF form falls through to octet-stream rather than
    masquerading as audio and hitting the wrong decoder at deploy time.
    """
    b = F.col(binary_col)
    hexhead = F.hex(F.substring(b, 1, 8))
    riff = hexhead.startswith("52494646")
    form = F.hex(F.substring(b, 9, 4))
    return df.withColumn("n_bytes", F.length(b)).withColumn(
        "sniffed_type",
        F.when(hexhead.startswith("89504E47"), "image/png")
        .when(hexhead.startswith("FFD8"), "image/jpeg")
        .when(riff & (form == "57415645"), "audio/wav")
        .when(riff & (form == "41564920"), "video/avi")
        .when(riff & (form == "57454250"), "image/webp")
        .when(F.substring(F.hex(F.substring(b, 5, 4)), 1, 8) == "66747970", "video/mp4")
        .otherwise("application/octet-stream"),
    )


def _decode_stub(payload: bytes, media_type: str, decode_real: bool) -> list[float]:
    """Deterministic fake feature vector (replace with a real decoder at
    deploy: PIL.Image.open / torchaudio.load / av.open)."""
    if decode_real:
        raise NotImplementedError(
            "real media decoding needs PIL/torchaudio/av — not in this container"
        )
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [((h[i] / 255.0) - 0.5) for i in range(FEATURE_DIM)]


def extract_media_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    type_col: str = "media_type",
    decode_real: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """decode -> feature-extract over mapInPandas (Arrow batches).

    Output: (doc_id, media_type, n_bytes, feature[FEATURE_DIM]).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk so one in-flight decode batch stays bounded even if
            # Arrow hands us a big batch
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    _decode_stub(p, t, decode_real)
                    for p, t in zip(chunk[binary_col], chunk[type_col])
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk[id_col].values,
                        "media_type": chunk[type_col].values,
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk[binary_col]],
                        "feature": feats,
                    }
                )

    cols = df.select(
        F.col(id_col), F.col(type_col), F.col(binary_col)
    )  # prune early: never ship unused columns into Python
    return cols.mapInPandas(run, schema=FEATURES_DDL)


def media_repartition_by_bytes(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    target_mb: int = 64,
    chunk_rows: int = 16384,
) -> DataFrame:
    """Partition media rows by CUMULATIVE payload bytes, not row count:
    rows ordered by ``id_col`` are packed into buckets of ~``target_mb``
    payload each, so a table mixing 4 GB videos with thumbnails still gets
    uniform tasks (a row bigger than the target gets a bucket to itself —
    a row can't be split).

    Scalable two-level prefix sum — no global single-partition window:
      1. rows are grouped into coarse id-chunks (id // chunk_rows); the
         windowed prefix over chunk totals runs on ONE ROW PER CHUNK
         (bounded metadata relation), not per row;
      2. within a chunk, a partitionBy(chunk) running sum (bounded by
         chunk_rows rows per window partition) adds the row-level offset;
      3. bucket = cumulative_bytes div target; rows land in their bucket
         via repartitionByRange (contiguous bucket ids -> ~1 bucket per
         output partition).
    ``id_col`` may be any orderable type: numeric ids chunk by integer
    division (preserves id locality); anything else (string asset ids,
    UUIDs) chunks by xxhash64 mod ceil(rows/chunk_rows) — deterministic,
    ~chunk_rows rows per chunk, at the cost of one extra count action.

    The only driver-side values are scalars (total bytes / row count for
    partition planning)."""
    from pyspark.sql.types import NumericType

    if id_col not in df.columns:
        raise ValueError(
            f"media_repartition_by_bytes needs id column {id_col!r} "
            f"(have: {df.columns}) — pass id_col="
        )
    target = target_mb * 1024 * 1024
    d = df.withColumn("_nb", F.length(F.col(binary_col)).cast("long"))
    if isinstance(df.schema[id_col].dataType, NumericType):
        d = d.withColumn("_chunk", F.floor(F.col(id_col) / chunk_rows))
    else:
        n_rows = d.count()
        n_chunks = max(1, -(-n_rows // chunk_rows))
        d = d.withColumn("_chunk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)))
    totals = d.groupBy("_chunk").agg(F.sum("_nb").alias("_cb"))
    total_bytes = totals.agg(F.sum("_cb")).collect()[0][0]  # scalar only
    if not total_bytes:
        return df
    wc = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_cb").over(wc), F.lit(0))
    ).select("_chunk", "_off")
    wr = (
        Window.partitionBy("_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_parts = int(total_bytes // target) + 1
    return (
        d.join(F.broadcast(offsets), "_chunk")
        .withColumn("_cum", F.col("_off") + F.coalesce(F.sum("_nb").over(wr), F.lit(0)))
        .withColumn("_bkt", F.floor(F.col("_cum") / target))
        .repartitionByRange(n_parts, "_bkt")
        .drop("_nb", "_chunk", "_off", "_cum", "_bkt")
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plan: one output row per (video, frame_ts). The frame
    timestamps are computed JVM-side with sequence+explode; the actual frame
    decode would plug into extract_media_features. Demonstrates the S6-style
    expansion (models/Block.ts:83-99) on media.

    Media with NULL or non-positive duration yields NO rows (nothing to
    decode) — the greatest(dur-1, 0) form would emit a phantom ts=0 frame
    for zero-length assets."""
    return df.where(F.col(duration_col) > 0).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col) - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
