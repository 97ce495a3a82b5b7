"""Append-only audit/event-log reducer (the events/block-meta analog).

The reference's ``emit(appendTo(...))`` path writes volatile operations —
append-only rows with a uuid, never read back into state and excluded from
replay (src/utils.ts:121-140; volatile filter stores/sequelize.ts:286-288;
consumers gnarly-reducer-events/src/reducer.ts:30-40 and
gnarly-reducer-block-meta/src/reducer.ts:16-37).

Ours is a pure projection appended to an audit sink. The uuid is
deterministic (uuid5 over url:op_seq) instead of the reference's uuid.v4
(utils.ts:126) so re-delivered batches produce identical rows — idempotent
under at-least-once — and golden tests are possible (FIXTURES.md F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIT_COLUMNS = ["uuid", "batch_id", "op_seq", "url", "reason", "meta"]


def audit_rows(events: DataFrame, batch_id: int = 0) -> DataFrame:
    """Project change events to append-only audit rows.

    uuid = uuid5-style deterministic id: sha1 over 'url:op_seq' formatted as
    a UUID (JVM-side — sha1/substring are codegen'd; no Python in the path).
    """
    h = F.sha1(F.concat_ws(":", F.col("url"), F.col("op_seq").cast("string")))
    uuid5 = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return events.select(
        uuid5.alias("uuid"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.col("op_seq"),
        F.col("url"),
        F.col("reason"),
        F.to_json(
            F.struct(F.col("op"), F.col("block_hash"), F.col("warc_ts"), F.col("lang"))
        ).alias("meta"),
    )
