"""10x scaling leg for the text-curation chain (VERDICT r04 #5).

The three stages a real corpus pass chains — pipeline_web_curation
(robots gate + anchor census + domain rollup), text_lang_id (NB trigram
language ID), dedup_minhash_lsh (shingle -> minhash -> banded candidate
join) — timed at sf0.1 (1x) and at a synthesized 10x of the same tables,
per-stage, so the linear-scaling claim for the text path rests on a
measured ratio rather than sf0.1 alone (the ANN path has the equivalent
evidence in pq_scan_bench.py's 1M->4M legs).

The 10x corpus is derived deterministically from sf0.1 (no external
data): documents replicate 10x with shifted doc_ids, replica r > 0
salting every 3rd word with a replica tag — every 3-word shingle
(minhash_lsh_pairs n=3) then contains a word that differs across any
two replicas, so cross-replica Jaccard is exactly 0 and the pair
workload scales ~linearly (a plain copy would square it inside dup
clusters; a word-DROP perturbation measured 85x pairs — large drop
steps leave minhash-estimated similarity above the noisy 8-hash
threshold), while each replica keeps the original's internal near-dup
structure; events replicate 10x with shifted
event_ids (url/anchor workloads derive from event_id); nation (the
robots-rules dim) is shared as-is.

Timing forces full materialization with a noop-format write — count()
alone lets Catalyst PRUNE unreferenced projections, silently skipping
the langid pandas UDF (measured: 0.15 s "scores" that were a bare scan
count).

    PYTHONPATH=/root/repo python tools/curation_scale_bench.py [cpus]

Prints one JSON line: per-stage best-of-2 seconds at 1x and 10x, the
10x/1x ratio, and the row counts driving each leg. Interpretation notes:
ratio ~= 10 is linear; BELOW 10 means the stage has a fixed term the
bigger leg amortizes (session/scan setup, the bounded distinct-url set
of the curation rollup); meaningfully above 10 means superlinear work
(e.g. extra LSH candidate pairs) and is worth a plan read.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
DOC_OFFSET = 10_000_000
EVT_OFFSET = 100_000_000


def build_10x(spark, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    legs = []
    for r in range(REPLICAS):
        if r == 0:
            t = F.col("text")
        else:
            # salt every 3rd word with the replica tag: the LSH shingles
            # are 3-WORD n-grams (minhash_lsh_pairs n=3), so every
            # shingle window holds >=1 salted word, and salts differ
            # across replicas — cross-replica shingle overlap is exactly
            # zero while within-replica dup structure is untouched
            # (single transform — no nested-transform CollapseProject
            # blowup)
            tag = F.lit(f"~{r}")
            t = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        i % 3 == F.lit(r % 3), F.concat(w, tag)
                    ).otherwise(w),
                ),
                " ",
            )
        legs.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * DOC_OFFSET)).alias("doc_id"),
                t.alias("text"),
                "lang",
                "source",
                F.length(t).cast("long").alias("n_chars"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    legs = [
        ev.select(
            (F.col("event_id") + F.lit(r * EVT_OFFSET)).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
        for r in range(REPLICAS)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    # robots-rules dim rides along unchanged (control-plane sized)
    src = os.path.join(SF_DIR, "nation.parquet")
    dst = os.path.join(out_dir, "nation.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        shutil.copyfile(src, dst)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    from gnarly_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    spark = get_spark(app_name="curation_scale", cpus=cpus, shuffle_partitions=cpus)

    import subprocess

    probe = subprocess.run(
        ["pgrep", "-af", "pytest|check_oracle"], capture_output=True, text=True
    )
    if probe.stdout.strip():
        print(
            f"WARNING: concurrent Spark work detected:\n{probe.stdout}",
            file=sys.stderr,
        )

    ten_dir = "/tmp/curation_10x"
    if not os.path.exists(os.path.join(ten_dir, "nation.parquet")):
        build_10x(spark, ten_dir)

    queries = entry.queries()
    stages = ["pipeline_web_curation", "text_lang_id", "dedup_minhash_lsh"]
    out = {"cpus": cpus, "sf_1x": SF_DIR, "stages": {}}
    for name in stages:
        q = queries[name]
        rec = {}
        for tag, d in (("1x", SF_DIR), ("10x", ten_dir)):
            rows = q(spark, d).count()  # warm + row count for the record

            def run():
                # fresh plan per run (AQE caches materialized shuffle
                # stages on re-executed DataFrame objects); noop write
                # materializes EVERY column — count() lets Catalyst
                # prune unreferenced UDF projections
                q(spark, d).write.format("noop").mode("overwrite").save()

            run()  # warm the full plan incl. pruned-under-count stages
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                run()
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            rec[f"s_{tag}"] = round(best, 3)
            rec[f"rows_{tag}"] = rows
        rec["ratio"] = round(rec["s_10x"] / max(rec["s_1x"], 1e-9), 2)
        out["stages"][name] = rec
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
