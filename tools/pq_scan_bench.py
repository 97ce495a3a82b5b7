"""PQ/ADC scan vs brute-force cosine at corpus scale: the memory-bound
ANN claim, measured. A 64-dim float64 corpus row is 512 B; its PQ code
(m=8) is 8 one-byte codes + id — 64x smaller. At 1e6 vectors the raw
relation is ~512 MB vs ~8 MB of codes, and the per-row query cost drops
from a 64-wide fused multiply-add chain to 8 array lookups.

Build cost is excluded (build once, scan per query — the serving regime);
both scans run over pre-materialized (localCheckpointed) relations.

Usage: PYTHONPATH=/root/repo python tools/pq_scan_bench.py [n_vectors]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from gnarly_spark.session import get_spark
from gnarly_spark.operators.similarity import (
    _isqdist, as_double, cosine, fixed_vec, pq_build_fixed,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="pq_scan_bench")
    par = spark.sparkContext.defaultParallelism

    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), "
                "j -> cast(pmod(xxhash64(id, j), 2000) as float) / 1000.0 - 1.0)"
            ).alias("embedding"),
        )
        .repartition(par)
        .localCheckpoint()
    )
    qids = [0, 1, 2]

    # ---- brute force: exact cosine over the raw vectors -----------------
    def brute():
        q = corpus.where(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
        )
        c = corpus.select(
            F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
        return (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
        )

    # ---- PQ: build once (untimed), then time the ADC scan ---------------
    cents, codes, ds = pq_build_fixed(corpus, m_subspaces=8, n_codes=16,
                                      iterations=1)
    codes = codes.repartition(par).localCheckpoint()
    folded = cents.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("code", "cv"))).alias("_cents")
    )
    qs = (
        corpus.where(F.col("vec_id").isin(qids))
        .select("vec_id", fixed_vec(as_double("embedding")).alias("qq"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.expr("sequence(1, 8)")).alias("sub"),
            F.expr(f"slice(qq, (sub - 1) * {ds} + 1, {ds})").alias("sv"),
        )
    )
    luts = (
        qs.join(F.broadcast(folded), "sub")
        .select(
            "query_id", "sub",
            F.transform("_cents", lambda c: _isqdist(F.col("sv"), c["cv"])).alias("lut"),
        )
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "lut"))).alias("_sl"))
        .select("query_id", F.transform("_sl", lambda s: s.lut).alias("luts"))
        .localCheckpoint()
    )

    def adc():
        adist = F.aggregate(
            F.zip_with("luts", "codes",
                       lambda l, c: F.element_at(l, (c + F.lit(1)).cast("int"))),
            F.lit(0).cast("bigint"), lambda a, v: a + v,
        )
        w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
        return (
            codes.crossJoin(F.broadcast(luts))
            .where(F.col("id") != F.col("query_id"))
            .select("query_id", F.col("id").alias("neighbor_id"), adist.alias("adist"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
        )

    def best_of(fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    t_brute = best_of(brute)
    t_adc = best_of(adc)
    raw_bytes = n * 64 * 4          # float32 corpus
    code_bytes = n * 8              # m=8 one-byte codes
    print(json.dumps({
        "metric": "PQ ADC scan vs brute-force cosine (3 queries, top-10)",
        "n_vectors": n,
        "brute_force_s": round(t_brute, 2),
        "pq_adc_s": round(t_adc, 2),
        "speedup": round(t_brute / t_adc, 2),
        "raw_mb": round(raw_bytes / 1e6, 1),
        "code_mb": round(code_bytes / 1e6, 1),
        "compression": round(raw_bytes / code_bytes, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
