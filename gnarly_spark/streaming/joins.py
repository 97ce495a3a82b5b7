"""Stream-stream event-time interval join (view -> purchase attribution).

The reference never joins two live streams (its single serialized queue
sees one ordered block stream); a web-scale eventing pipeline constantly
does — "which crawl/view preceded this purchase within the horizon" is the
canonical attribution shape. The Spark-first form is Structured Streaming's
stateful symmetric hash join:

* both sides carry a watermark and the join predicate carries an explicit
  event-time range (purchase_ts in [view_ts, view_ts + horizon]), which is
  what lets the engine BOUND state: a buffered view row is evicted as soon
  as the purchase-side watermark passes view_ts + horizon — without the
  range the state is the whole history;
* the guaranteed late-data semantics is STATE EVICTION, not input drop
  (review r05 docstring fix): a late row can no longer join against
  closed (evicted) state — tested — but two late rows arriving in the
  SAME micro-batch may still legitimately join each other, since no
  closed state is involved (tests/test_stream_join.py pins exactly
  this); consumers needing a hard "nothing older than the watermark
  ever emits" must filter on event time downstream;
* the state store hash-partitions both sides on the equi-key (user), so
  the join is co-located per micro-batch: each trigger shuffles only that
  trigger's rows, never the buffered state.

Batch/stream parity: the same function on batch DataFrames degrades to a
plain interval join (withWatermark is a batch no-op) — backfill and live
tail share one code path, and the driver oracle checks the streaming
answer against the batch SQL statement of the same join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Every (view, purchase) pair for the same user with the purchase
    inside [view_ts, view_ts + horizon]. Inner join — purchases with no
    qualifying view emit nothing (attribution, not enrichment).

    Output: (user_id, view_ts, purchase_ts, value).
    """
    v = views.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col(user_col).alias("p_user"),
        F.col(ts_col).cast("timestamp").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.expr(f"view_ts + INTERVAL {horizon}"))
    )
    return v.join(p, cond, "inner").select(
        "user_id", "view_ts", "purchase_ts", "value"
    )
