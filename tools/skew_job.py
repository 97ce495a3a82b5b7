"""Hot-key skew A/B: LWW strategies on a Zipf-skewed changelog (skew=0.9 =>
the hottest url receives ~30% of ALL events — the 'hot-url melts one
partition' scenario from the north_star).

Compares, at one core count, wall time of:
  - window    row_number() OVER (PARTITION BY url ...)  — co-locates every
              row of the hot url on one task before ranking (the naive plan)
  - max_by    partial-agg LWW (the engine default — map-side combine
              pre-reduces the hot url to one row per input partition)
  - salted    explicit two-phase local/global reduce (defense for when the
              partial agg is defeated, e.g. sort-agg fallback on wide rows)

Usage: python tools/skew_job.py <cpus> <changelog_dir>
Prints one JSON line {"cpus", "n_events", "hot_share", "window_s",
"max_by_s", "salted_s"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main():
    cpus = int(sys.argv[1])
    changelog = sys.argv[2]

    from pyspark.sql import functions as F

    from gnarly_spark.operators.replay import (
        last_writer_wins,
        last_writer_wins_salted,
        last_writer_wins_window,
    )
    from gnarly_spark.session import get_spark

    spark = get_spark(app_name=f"skew_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    log = spark.read.parquet(changelog)
    n = log.count()
    hot = (
        log.groupBy("url").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )

    def run(fn):
        # untimed warm-up then best-of-2, fresh plan per run (AQE caches
        # materialized stages on reused DataFrame objects)
        def once():
            fn(spark.read.parquet(changelog)).write.format("noop").mode(
                "overwrite"
            ).save()

        once()
        return round(min(_timed(once) for _ in range(2)), 2)

    out = {
        "cpus": cpus,
        "n_events": n,
        "hot_share": round(hot["count"] / n, 3),
        "window_s": run(last_writer_wins_window),
        "max_by_s": run(last_writer_wins),
        "salted_s": run(lambda df: last_writer_wins_salted(df, n_salts=cpus)),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
