"""JSON-patch path parsing (operator P11 — the reference's ``parsePath``).

Reference: packages/gnarly-core/src/utils.ts:24-36 — a patch path
``/tableName/pk/indexOrKey`` destructures into its three segments, which
the typed-store applier uses to route INSERT/UPDATE/DELETE
(typeStore/Sequelize.ts:60-99). Round 1 dropped this by design (typed
columns replace patch paths in the Spark data model); it is provided now
for full parity: a pipeline ingesting JSON-patch-shaped CDC feeds can
route on the parsed struct exactly like the reference.

Pure JVM split — codegen'd, no Python; out-of-range segments are NULL
(try_element_at, ANSI-safe).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def parse_path(col):
    """``'/table/pk/indexOrKey'`` -> struct(table_name, pk, index_or_key).

    Segment 1 is the empty string before the leading slash (ignored, like
    the reference's ``emptyString``); missing trailing segments are NULL.
    """
    parts = F.split(col, "/")
    return F.struct(
        F.try_element_at(parts, F.lit(2)).alias("table_name"),
        F.try_element_at(parts, F.lit(3)).alias("pk"),
        F.try_element_at(parts, F.lit(4)).alias("index_or_key"),
    )
