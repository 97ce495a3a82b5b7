"""Web link graph: anchor extraction -> host graph -> fixed-point PageRank.

The training-data angle: link-graph centrality is the classic crawl-scale
quality prior (Page et al. 1999; Common Crawl publishes exactly this as its
host-level web graph). A host's PageRank feeds corpus curation the same way
the text quality scores in functions/text.py do — e.g. weight the mixture
sampler by centrality, or drop link-farm hosts with high out-degree and
near-zero rank.

Scale shape, stage by stage:
- ``extract_links`` is map-only JVM work (regexp_extract_all + explode);
  no Python touches the HTML and nothing shuffles until the graph groupBy.
- ``host_graph`` collapses page-level links to DISTINCT host edges first —
  at crawl scale the host graph is ~1e7 nodes vs 1e10 pages, so every
  PageRank round runs on the small relation, never the corpus.
- ``pagerank`` is the canonical iterative join+agg: each round is ONE
  shuffle join (ranks ⋈ edges on src) + ONE groupBy(dst) partial-agg sum,
  with lineage cut per round via localCheckpoint — identical shape to
  dedup.duplicate_clusters, which is this engine's other iterative op.

Determinism: ranks are FIXED-POINT BIGINTs (scale = 10^6 by default), the
damping factor is the exact fraction 85/100, and every divide is integer
floor-division on non-negative values — so the result is bit-identical in
any engine, and the DuckDB oracle (catalog_graph.py) replays the exact
iterations as chained CTEs. A float PageRank would hash-mismatch on
sum-order ULPs; the fixed-point variant is what you'd run for reproducible
corpus curation anyway. Per-edge quotients floor (documented bias: total
mass leaks <= outdeg ULPs per node per round — at scale 10^6 that is a
relative error < 1e-5, far under curation-threshold noise).

Semantics notes (standard static-PageRank choices, same as GraphX's
``staticPageRank``): dangling hosts (no outlinks) contribute no mass;
self-loops are dropped in ``host_graph``; pr0 = 1.0 (scale) for every node;
no normalization — ranks are centrality scores, not probabilities.

Reference parity: the reference engine has no graph operators; net-new
capability per the training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one regex, shared with the SQL oracle text in catalog_graph.py:
# href value of an anchor tag, either quote style
HREF_RE = """<a href=["']([^"']+)["']"""
HOST_RE = "^https?://([^/]+)"


def host_of(col: Column | str) -> Column:
    """Host part of an absolute http(s) URL ('' when not absolute).

    Deliberately regexp_extract, not parse_url: the oracle engine has no
    parse_url, and a shared regex keeps both sides byte-identical.
    """
    return F.regexp_extract(col, HOST_RE, 1)


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) page-level link rows from raw HTML anchors.

    Map-only: regexp_extract_all pulls every href in one JVM pass, explode
    fans out, and relative links (no scheme+host) are dropped — resolving
    them against a base URL is a curation decision this operator does not
    take. Column pruning means the scan reads only (url, html).
    """
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.explode(
                F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
            ).alias("dst"),
        )
        .where(host_of("dst") != "")
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Collapse page-level links to the weighted DISTINCT host graph:
    (src_host, dst_host, n_links), self-loops dropped.

    The ONE corpus-sized shuffle in the whole pipeline; everything
    iterative afterwards runs on the collapsed host relation.
    """
    return (
        links.select(
            host_of("src").alias("src_host"), host_of("dst").alias("dst_host")
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**6,
) -> DataFrame:
    """Fixed-point static PageRank over (src_host, dst_host) edges.

    Per iteration, all-integer (d = dn/dd):

        w(u)       = scale // outdeg(u)                 (per-source quotient)
        contrib(v) = SUM over u->v of (pr(u) * w(u)) // scale
        pr'(v)     = (scale * (dd - dn)) // dd + (dn * contrib(v)) // dd

    Returns (host, pr) with pr0 = scale. Each round: one shuffle join on
    src + one groupBy(dst) sum (partial-aggregated map-side), then a left
    join back to the full node set so zero-indegree hosts keep the
    teleport term. localCheckpoint per round cuts lineage so plan size is
    O(1) in n_iter (the duplicate_clusters lesson).

    Overflow headroom: pr <= n_nodes * scale (mass never grows), w <= scale,
    so pr*w <= n_nodes * scale^2 — at scale 10^6 safe for n_nodes < 9e6;
    pass scale=10**4 for a billion-host graph.
    """
    dn, dd = damping
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    out_w = (
        edges.groupBy("src_host")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .select("src_host", F.expr(f"CAST({scale} AS BIGINT) div outdeg").alias("w"))
    )
    # edges annotated once with the source weight; reused every round
    ew = edges.join(out_w, "src_host").select("src_host", "dst_host", "w")
    ew = ew.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)

    base = (scale * (dd - dn)) // dd
    pr = nodes.select("host", F.lit(scale).cast("long").alias("pr"))
    for _ in range(n_iter):
        contrib = (
            pr.join(ew, pr["host"] == ew["src_host"])
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(pr * w) div " + str(scale)).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({dn} * coalesce(contrib, CAST(0 AS BIGINT))) div {dd}"
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


def host_rank_report(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    n_iter: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """End-to-end: pages -> links -> host graph -> PageRank, joined with
    in/out degree — the per-host curation-signal table.

    Output: (host, out_deg, in_deg, n_inlinks, pr) with pr fixed-point at
    ``scale``. Degrees are DISTINCT-neighbor counts; n_inlinks is the raw
    page-level link weight pointing at the host.
    """
    g = host_graph(extract_links(pages, url_col, html_col)).localCheckpoint(
        eager=True
    )
    ranks = pagerank(g, n_iter=n_iter, scale=scale)
    outd = g.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = g.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_deg"),
        F.sum("n_links").alias("n_inlinks"),
    )
    return (
        ranks.join(outd, "host", "left")
        .join(ind, "host", "left")
        .select(
            "host",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("n_inlinks", F.lit(0).cast("long")).alias("n_inlinks"),
            "pr",
        )
    )


def link_census_reducer(name: str = "host_links"):
    """Pipeline integration: an AppendReducer that maintains the host
    link census INCREMENTALLY as crawls stream through the CDC engine —
    each micro-batch contributes the host-graph collapse of its own
    insert/update pages (O(batch) work, one tiny append), and
    ``link_census_read`` folds the per-batch censuses into the current
    edge table for ``pagerank``.

    Semantics: observational, like the audit log — a crawl that happened
    contributes its links even if a later reorg reverts the page state
    (reorgs don't un-crawl), deletes carry no html so add nothing, and
    the per-batch append is refire-idempotent via AppendReducer's
    batch-path guard. For state-tracking semantics (only currently-live
    page versions count) run host_rank_report over the pages table
    instead.
    """
    from gnarly_spark.reducers import AppendReducer

    def project(batch: DataFrame) -> DataFrame:
        pages = batch.where(F.col("op").isin("insert", "update")).select(
            "url", F.col("html").cast("string").alias("_html")
        )
        return host_graph(extract_links(pages, "url", "_html"))

    return AppendReducer(
        name=name,
        project=project,
        schema="src_host string, dst_host string, n_links bigint",
    )


def link_census_read(reducer, ctx) -> DataFrame:
    """Current census edges: fold the per-batch partial censuses (a
    sum-merge — host_graph weights are abelian, so per-batch collapse
    then re-sum equals one global collapse)."""
    return (
        reducer.read(ctx)
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n_links").alias("n_links"))
    )


# a whole anchor tag (href + text) — shared with catalog_graph.py's oracle
ATAG_RE = """<a href=["'][^"']+["'][^>]*>[^<]*</a>"""
ATEXT_RE = ">([^<]*)</a>"


def anchor_text_census(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-target anchor-text aggregation — the classic search/crawl
    signal (how the WEB describes a page, vs how the page describes
    itself): for every absolute link target, the mention count, the number
    of distinct normalized anchor phrasings, and the dominant phrasing.
    Training-data uses: query-document pairs for retrieval corpora, weak
    labels/titles for pages whose own text is boilerplate, and link-farm
    detection (thousands of mentions, one phrasing).

    Scale shape: tag extraction is map-only JVM (regexp_extract_all +
    explode, same as extract_links — no Python touches HTML); the one
    corpus-sized shuffle is groupBy(dst, anchor) with map-side partial
    aggregation; the per-target rollup then runs on the collapsed
    relation. The dominant phrasing is max(struct(n, anchor)) — a partial
    aggregate, never a window over the corpus. Relative hrefs and empty
    anchor texts are dropped (same absolute-URL rule as extract_links).

    Output: (dst_url, n_mentions, n_anchor_forms, top_anchor, top_n);
    ties on count break to the lexicographically LAST phrasing (max of
    the (n, anchor) struct) — deterministic in any engine.
    """
    return anchor_rollup(anchor_pair_counts(pages, html_col))


def anchor_pair_counts(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(dst_url, anchor, n): per-(target, normalized phrasing) mention
    counts — the ABELIAN sufficient statistic of the census (counts sum,
    so per-batch partials fold into the corpus census exactly; see
    anchor_census_reducer). Extraction is map-only JVM; the groupBy is
    the one corpus-sized shuffle with map-side partial aggregation."""
    from gnarly_spark.operators.dedup import normalize_text

    tags = pages.select(
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ATAG_RE), 0)
        ).alias("tag")
    )
    pairs = tags.select(
        F.regexp_extract("tag", HREF_RE, 1).alias("dst_url"),
        normalize_text(F.regexp_extract("tag", ATEXT_RE, 1)).alias("anchor"),
    ).where((host_of(F.col("dst_url")) != "") & (F.col("anchor") != ""))
    return pairs.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )


def anchor_rollup(pa: DataFrame) -> DataFrame:
    """Per-target rollup of (dst_url, anchor, n) pair counts — runs on the
    collapsed relation, never the corpus."""
    return pa.groupBy("dst_url").agg(
        F.sum("n").cast("bigint").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_anchor_forms"),
        F.max(F.struct("n", "anchor")).alias("_t"),
    ).select(
        "dst_url",
        "n_mentions",
        "n_anchor_forms",
        F.col("_t.anchor").alias("top_anchor"),
        F.col("_t.n").alias("top_n"),
    )


def anchor_census_reducer(name: str = "anchor_text"):
    """Pipeline integration: an AppendReducer maintaining the anchor-text
    census INCREMENTALLY — each micro-batch appends the (dst_url, anchor,
    n) collapse of its own insert/update pages (O(batch)), and
    ``anchor_census_read`` folds + rolls up. Observational semantics like
    link_census_reducer (reorgs don't un-crawl; deletes add nothing;
    refires no-op via the batch-path guard)."""
    from gnarly_spark.reducers import AppendReducer

    def project(batch: DataFrame) -> DataFrame:
        pages = batch.where(F.col("op").isin("insert", "update")).select(
            F.col("html").cast("string").alias("_html")
        )
        return anchor_pair_counts(pages, "_html")

    return AppendReducer(
        name=name,
        project=project,
        schema="dst_url string, anchor string, n bigint",
    )


def anchor_census_read(reducer, ctx) -> DataFrame:
    """Current census: fold per-batch pair counts (abelian sum), then the
    same rollup as the batch operator — proven equal in pytest."""
    pa = (
        reducer.read(ctx)
        .groupBy("dst_url", "anchor")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    return anchor_rollup(pa)


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999) over (src_host, dst_host) edges —
    hubs & authorities, the complementary centrality to PageRank (a hub
    links to many good authorities; an authority is linked by many good
    hubs — directory pages vs content pages in a crawl frontier).

    All-integer with MAX-normalization instead of L2 (same bin-length
    move as pagerank/unigram_surprisal: floor division keeps every round
    bit-identical across engines, so the oracle replays it in chained
    CTEs):

        araw(v)  = SUM over u->v of hub(u)            (0 if no in-links)
        auth'(v) = (araw(v) * scale) // max(araw)
        hraw(u)  = SUM over u->v of auth'(v)          (0 if no out-links)
        hub'(u)  = (hraw(u) * scale) // max(hraw)

    Edge MULTIPLICITY is ignored (adjacency is 0/1 — classic HITS), so
    callers pass the distinct host graph; auth0 = hub0 = scale.

    Scale shape: per round, two shuffle joins on the (collapsed, small)
    host relation + two partial-agg sums; the global max is a scalar
    aggregate broadcast back with a one-row crossJoin — never a collect,
    never a window over the whole relation. localCheckpoint per round
    cuts lineage (plan stays O(1) in n_iter — the duplicate_clusters
    lesson). Overflow headroom: auth,hub <= scale, raw <= n*scale, raw *
    scale <= n*scale^2 — scale 10^6 is safe below 9e6 hosts; drop to
    10^4 beyond.
    """
    e = edges.select("src_host", "dst_host").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src_host").alias("host"))
        .unionByName(e.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = nodes.select("host", F.lit(scale).cast("long").alias("auth"))
    hub = nodes.select("host", F.lit(scale).cast("long").alias("hub"))

    def _norm(raw_df: DataFrame, col: str) -> DataFrame:
        mx = raw_df.agg(F.max(col).alias("_mx"))
        return raw_df.crossJoin(F.broadcast(mx)).select(
            "host",
            F.expr(f"({col} * CAST({scale} AS BIGINT)) div greatest(_mx, 1)").alias(
                col[1:]  # _a -> a
            ),
        )

    for _ in range(n_iter):
        araw = (
            nodes.join(
                hub.join(e, hub["host"] == e["src_host"])
                .select(F.col("dst_host").alias("host"), F.col("hub").alias("c"))
                .groupBy("host")
                .agg(F.sum("c").alias("c")),
                "host",
                "left",
            )
            .select("host", F.coalesce("c", F.lit(0).cast("long")).alias("_auth"))
        )
        auth = _norm(araw, "_auth").localCheckpoint(eager=True)
        hraw = (
            nodes.join(
                auth.join(e, auth["host"] == e["dst_host"])
                .select(F.col("src_host").alias("host"), F.col("auth").alias("c"))
                .groupBy("host")
                .agg(F.sum("c").alias("c")),
                "host",
                "left",
            )
            .select("host", F.coalesce("c", F.lit(0).cast("long")).alias("_hub"))
        )
        hub = _norm(hraw, "_hub").localCheckpoint(eager=True)
    return auth.join(hub, "host")
