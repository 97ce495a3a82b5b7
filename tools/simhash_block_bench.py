"""A/B: simhash Hamming-pair blocking modes at the 40x corpus (200k docs).

Measures what VERDICT r02 flagged on the disjoint-band mode: candidate
volume ~n^2 / keyspace. Disjoint 64-bit/4-band keys have 2^16 values; the
Manku combination mode (b=6, radius 3 -> C(6,3)=20 keys of 31 bits) pays
5x the banded rows for a ~2^15x wider keyspace. This prints, per mode:
candidate rows entering the xor verify, verified pairs, and wall time —
the candidate column is the one that decides feasibility at 1e10 docs.

Run: python tools/simhash_block_bench.py [n_docs ...]   (default 50k 200k)
Appends nothing; paste the table into BENCH.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from gnarly_spark.operators.dedup import (
    simhash,
    simhash_band_relation,
    simhash_hamming_pairs,
)
from gnarly_spark.session import get_spark


def templated_docs(spark, n: int):
    """60 tokens per doc from a 5k vocab, all JVM exprs (datagen pattern);
    doc 2k+1 is doc 2k with its last token changed for 1% of docs —
    planted near-dup pairs so verified-pair counts are non-trivial."""
    base = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("seed") * 64 + i), F.lit(5000)).cast("string"),
        ),
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            # 1% planted pairs: odd ids in the planted range share the even
            # neighbor's seed (same first 59 tokens), last token differs
            F.when(
                (F.col("id") % 100 == 1) & (F.col("id") % 2 == 1),
                F.col("id") - 1,
            )
            .otherwise(F.col("id"))
            .alias("seed"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.when(
                    F.col("seed") != F.col("doc_id"),
                    F.concat(F.slice(base, 1, 59), F.array(F.lit("wEDIT"))),
                ).otherwise(base),
                " ",
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def candidates(sig, **kw) -> int:
    banded = simhash_band_relation(sig, **kw)
    a, b = banded.alias("a").hint("shuffle_hash"), banded.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.id") < F.col("b.id")),
    ).count()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]
    spark = get_spark(cpus=32)
    modes = {
        "disjoint b=4 (2^16 keys)": dict(
            max_hamming=3, bands=4, bits=64, combination_blocks=None
        ),
        "combination b=6 (2^31 keys)": dict(
            max_hamming=3, bands=4, bits=64, combination_blocks=6
        ),
    }
    print("| docs | mode | candidate rows | verified pairs | wall s |")
    print("|---|---|---|---|---|")
    for n in sizes:
        docs = templated_docs(spark, n)
        sig = simhash(docs, bits=64).localCheckpoint(eager=True)
        for name, kw in modes.items():
            t0 = time.time()
            cand = candidates(sig, **kw)
            pairs = simhash_hamming_pairs(docs, **kw).count()
            dt = time.time() - t0
            print(f"| {n:,} | {name} | {cand:,} | {pairs:,} | {dt:.1f} |", flush=True)


if __name__ == "__main__":
    main()
