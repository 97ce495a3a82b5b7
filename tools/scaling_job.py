"""One scaling-bench run: full CDC batch replay (scan -> revert anti-join ->
LWW -> extraction) over a pre-generated changelog at a given core count.

Usage: python tools/scaling_job.py <cpus> <changelog_dir> [--gen N_EVENTS]

With --gen, (re)generates the changelog parquet first (done once, at the
highest core count, so both timed runs read identical input). Prints one
JSON line {"cpus":..., "n_events":..., "wall_s":..., "events_per_s":...}.
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
    changelog_dir = sys.argv[2]
    gen_n = None
    if "--gen" in sys.argv:
        gen_n = int(sys.argv[sys.argv.index("--gen") + 1])

    from gnarly_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_{cpus}", cpus=cpus, shuffle_partitions=cpus)

    if gen_n:
        from gnarly_spark.datagen import gen_changelog_spark

        gen_changelog_spark(spark, gen_n, skew=0.2).write.mode("overwrite").parquet(
            changelog_dir
        )

    from gnarly_spark.operators.replay import final_state

    log = spark.read.parquet(changelog_dir)
    n = log.count()
    # one full untimed warm-up run: JIT/codegen compilation, Python UDF
    # worker pool startup, and OS page cache for the input — the steady
    # state is what a sustained ingest job runs in
    final_state(log).write.format("noop").mode("overwrite").save()

    wall = min(
        _timed(lambda: final_state(log).write.format("noop").mode("overwrite").save())
        for _ in range(2)
    )
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n,
                "wall_s": round(wall, 2),
                "events_per_s": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
