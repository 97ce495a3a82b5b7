"""End-to-end curation-pass throughput (jobs/curate_job.py) at 1M docs:
quality + lang gates, exact dedup, DSIR threshold, 64-shard export — the
whole deployable pipeline, not per-operator numbers.

Corpus: 1M synthetic docs (JVM exprs — ~40-token English-like text over a
5k vocab, 10% exact duplicates planted, 5% junk rows), written once to
$TMPDIR and reused across legs.

Run:  SPARK_GRAFT_CPUS=8  python tools/curate_bench.py
      SPARK_GRAFT_CPUS=32 python tools/curate_bench.py
      (PYTHONPATH=/root/repo when nohup'd)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gnarly_spark.session import get_spark

N_DOCS = 1_000_000
CORPUS = os.path.join(tempfile.gettempdir(), "gnarly_curate_corpus")


def make_corpus(spark):
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    i = F.col("id")
    # 10% duplicates: doc i in [0, 100k) shares text with i + 900k
    base = F.when(i >= 900_000, i - 900_000).otherwise(i)
    word = lambda k: F.concat(  # noqa: E731
        F.lit("the w"), ((base * k + k * k) % 5_000).cast("string")
    )
    # the base-id word keeps texts DISTINCT across base ids (the %5000
    # vocab alone would alias every 5000th doc into one fingerprint)
    en_text = F.concat_ws(
        " ",
        F.concat(F.lit("the d"), base.cast("string")),
        *[word(k) for k in range(1, 41)],
    )
    junk = F.concat(F.lit("zzqq $$$ 9 9 "), (i % 97).cast("string"))
    text = F.when(i % 20 == 7, junk).otherwise(en_text)  # 5% junk
    spark.range(N_DOCS).select(
        F.concat(F.lit("https://h"), (i % 50_000).cast("string"),
                 F.lit(".example/p/"), i.cast("string")).alias("doc_id"),
        text.alias("text"),
    ).write.mode("overwrite").parquet(CORPUS)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="curate_bench", cpus=cpus, shuffle_partitions=cpus
    )
    make_corpus(spark)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import curate_job

    out = tempfile.mkdtemp(prefix="gnarly_curate_out_")
    t0 = time.time()
    curate_job.main([
        "--input", CORPUS, "--out", os.path.join(out, "shards"),
        "--shards", "64",
        "--min-quality", "0.2", "--lang", "en", "--dedup",
        "--dsir-target", "doc_id LIKE '%.example/p/1%'",
        "--dsir-min-logw", "-1000000",
    ])
    t = time.time() - t0
    print(f"curate_1M_docs: {t:.1f}s = {N_DOCS / t / 1e3:.0f}k docs/s "
          f"(cpus={cpus})", flush=True)


if __name__ == "__main__":
    main()
