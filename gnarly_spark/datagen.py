"""Distributed deterministic changelog generator for benchmarks.

The pytest fixtures (fixtures.py) build small chains row-by-row in pandas —
fine for 10^2..10^4 events. Benchmarks need 10^7+ events, so this generator
builds the changelog INSIDE Spark from `spark.range(n)`: every column is a
deterministic JVM-side expression of op_seq (xxhash64/md5/concat — all
codegen'd), which means:

- generation parallelizes across all cores and never touches Python;
- the same (n_events, params) always yields the identical table
  (seed folded into the hashes);
- it scales to 10^10 rows on a real cluster unchanged — generation is
  embarrassingly parallel over the range split.

The html payload embeds title/script/entity/comment cases so the
extraction UDF does representative work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gen_changelog_spark(
    spark: SparkSession,
    n_events: int,
    events_per_block: int = 1000,
    n_urls: int | None = None,
    delete_every: int = 20,
    revert_every_blocks: int = 50,
    skew: float = 0.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic changelog of n_events rows (+1 revert row per
    revert_every_blocks). skew in [0,1): 0 = uniform urls; higher values
    concentrate events on low url ids (Zipf-ish hot-key workload)."""
    n_urls = n_urls or max(16, n_events // 20)
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    seq = F.col("id") + 1
    h = F.abs(F.xxhash64(F.concat_ws(":", F.lit(seed), seq)))
    u = (h % 1000000) / 1000000.0
    if skew > 0:
        exponent = 1.0 / (1.0 - skew)
        url_idx = F.floor(F.lit(n_urls) * F.pow(u, F.lit(exponent)))
    else:
        url_idx = h % n_urls
    block_id = ((seq - 1) / events_per_block).cast("long")
    url = F.concat(F.lit("https://site-"), (url_idx % 100).cast("string"),
                   F.lit(".example/page/"), url_idx.cast("string"))
    digest = F.md5(F.concat_ws("|", url, seq))
    html = F.concat(
        F.lit("<html><head><title>"), url, F.lit(" v"), seq.cast("string"),
        F.lit("</title><style>.x{color:red}</style><script>var v="),
        seq.cast("string"),
        F.lit(";</script></head><!-- crawl "), digest,
        F.lit(" --><body><h1>Page&nbsp;"), digest, F.lit("</h1>"),
        F.lit("<p>para "), digest, F.lit(" &amp; more &lt;raw&gt;</p>"),
        F.lit("<p>body "), F.repeat(digest, 8), F.lit("</p></body></html>"),
    )
    # op_seq IS the delivery order (the changelog total-order contract the
    # pipeline enforces): event rows leave gaps for the revert rows that
    # interleave right after the block they undo — a revert is never
    # emitted beyond the reorg-retention window, exactly like a real WAL.
    # Revert k (of block k*reb, emitted at the head of block k*reb + 1)
    # takes op_seq = (k*reb + 1)*epb + k; events shift up by the number of
    # reverts delivered before their block.
    reb = revert_every_blocks
    ordered_seq = (
        seq + F.floor(F.greatest(block_id - 1, F.lit(0)) / reb) if reb else seq
    )
    events = rng.select(
        ordered_seq.alias("op_seq"),
        block_id.alias("block_id"),
        F.concat(F.lit("b"), block_id.cast("string")).alias("block_hash"),
        F.concat(F.lit("b"), (block_id - 1).cast("string")).alias("parent_hash"),
        F.when(h % delete_every == 0, "delete").otherwise("update").alias("op"),
        url.alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + block_id * 60 + (seq % events_per_block) / 100.0
        ).alias("warc_ts"),  # 2024-01-01 UTC base
        F.when(h % delete_every != 0, html.cast("binary")).alias("html"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
                     (h % 4 + 1).cast("int")).alias("lang"),
        F.lit(None).cast("string").alias("revert_of_block"),
        F.when(h % delete_every == 0, "PAGE_DELETED").otherwise("PAGE_CRAWLED").alias("reason"),
    )
    n_blocks = (n_events + events_per_block - 1) // events_per_block
    # real blocks are 0..n_blocks-1 and revert k is emitted from block
    # rb+1, so rb = k*reb must stay <= n_blocks-2 — one k beyond that
    # emits a phantom revert of a block with no events, carried by a block
    # id past the chain head (inflating the pipeline's block watermark)
    n_rev = max(0, (n_blocks - 2) // revert_every_blocks) if revert_every_blocks else 0
    if n_rev > 0:
        # one revert row per revert_every_blocks-th block, emitted from the
        # following block, undoing the block before it
        rev = (
            spark.range(1, n_rev + 1)
            .select(
                (F.col("id") * revert_every_blocks).alias("rb"),
                F.col("id").alias("k"),
            )
            .select(
                ((F.col("rb") + 1) * events_per_block + F.col("k")).alias("op_seq"),
                (F.col("rb") + 1).alias("block_id"),
                F.concat(F.lit("b"), (F.col("rb") + 1).cast("string")).alias("block_hash"),
                F.concat(F.lit("b"), F.col("rb").cast("string")).alias("parent_hash"),
                F.lit("revert").alias("op"),
                F.lit(None).cast("string").alias("url"),
                F.timestamp_seconds(
                    F.lit(1704067200) + (F.col("rb") + 1) * 60
                ).alias("warc_ts"),
                F.lit(None).cast("binary").alias("html"),
                F.lit(None).cast("string").alias("lang"),
                F.concat(F.lit("b"), F.col("rb").cast("string")).alias("revert_of_block"),
                F.lit("ROLLBACK").alias("reason"),
            )
        )
        events = events.unionByName(rev)
    return events
