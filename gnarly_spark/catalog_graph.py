"""Link-graph driver queries: anchor extraction -> host graph -> PageRank.

The oracle replays the EXACT fixed-point PageRank iterations as chained
CTEs (one per round) — possible only because operators/graph.py keeps every
rank an integer: floor divisions and integer sums are bit-identical across
engines, where a float PageRank would hash-mismatch on sum-order ULPs.

Pages are derived from the driver's `events` table (same move as
catalog.py's _CHANGELOG_SQL): url/html are deterministic string builds on
(user_id, event_id), giving a 23-host graph with a skewed link profile,
multi-crawl duplicate urls, a second single-quoted anchor on every third
page, and a relative link every fifth page that extraction must drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnarly_spark.catalog import _t, register

_N_ITER = 5
_SCALE = 10**6
_DN, _DD = 85, 100

# ---------------------------------------------------------------------------
# derived "crawled pages with anchors" relation over `events`
# ---------------------------------------------------------------------------

_PAGES_SQL = """
    SELECT 'https://h' || CAST(user_id % 23 AS VARCHAR) || '.example/p/'
               || CAST(user_id AS VARCHAR) AS url,
           '<html><body><p>t</p>'
             || '<a href="https://h' || CAST(event_id % 23 AS VARCHAR)
                || '.example/p/' || CAST(event_id % 101 AS VARCHAR)
                || '">l1</a>'
             || CASE WHEN event_id % 3 = 0
                     THEN '<a href=''https://h'
                          || CAST((event_id * 7) % 23 AS VARCHAR)
                          || '.example/q''>l2</a>'
                     ELSE '' END
             || CASE WHEN event_id % 5 = 0
                     THEN '<a href="/rel/skip">r</a>' ELSE '' END
             || '</body></html>' AS html
    FROM events
"""


def _page_cols() -> tuple:
    """(url, html) column expressions over an `events` row — shared by the
    batch pages relation and the streaming-census changelog so both derive
    byte-identical pages from the same rows."""
    uid, eid = F.col("user_id"), F.col("event_id")
    a1 = F.concat(
        F.lit('<a href="https://h'),
        (eid % 23).cast("string"),
        F.lit(".example/p/"),
        (eid % 101).cast("string"),
        F.lit('">l1</a>'),
    )
    a2 = F.when(
        eid % 3 == 0,
        F.concat(
            F.lit("<a href='https://h"),
            ((eid * 7) % 23).cast("string"),
            F.lit(".example/q'>l2</a>"),
        ),
    ).otherwise(F.lit(""))
    rel = F.when(eid % 5 == 0, F.lit('<a href="/rel/skip">r</a>')).otherwise(
        F.lit("")
    )
    url = F.concat(
        F.lit("https://h"),
        (uid % 23).cast("string"),
        F.lit(".example/p/"),
        uid.cast("string"),
    )
    html = F.concat(
        F.lit("<html><body><p>t</p>"), a1, a2, rel, F.lit("</body></html>")
    )
    return url, html


def _pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    url, html = _page_cols()
    return _t(spark, sf_dir, "events").select(
        url.alias("url"), html.alias("html")
    )


def _oracle_sql() -> str:
    """Chained-CTE replay of host_rank_report: extraction regex, host
    graph, and _N_ITER integer PageRank rounds, formula-identical to
    operators/graph.py (dn/dd = 85/100, scale = 10^6, floor divisions)."""
    from gnarly_spark.operators.graph import HOST_RE, HREF_RE

    href_re = HREF_RE.replace("'", "''")
    host_re = HOST_RE
    base = (_SCALE * (_DD - _DN)) // _DD
    rounds = []
    for i in range(_N_ITER):
        rounds.append(f"""
    pr{i + 1} AS (
      SELECT n.host,
             CAST({base} + ({_DN} * COALESCE(c.contrib, 0)) // {_DD} AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT ew.dst_host AS host,
               CAST(SUM((pr{i}.pr * ew.w) // {_SCALE}) AS BIGINT) AS contrib
        FROM pr{i} JOIN ew ON pr{i}.host = ew.src_host
        GROUP BY ew.dst_host) c ON n.host = c.host)""")
    return f"""
    WITH pages AS ({_PAGES_SQL}),
    links AS (
      SELECT src, dst FROM (
        SELECT url AS src,
               unnest(regexp_extract_all(html, '{href_re}', 1)) AS dst
        FROM pages)
      WHERE regexp_extract(dst, '{host_re}', 1) != ''),
    g AS (
      SELECT src_host, dst_host, COUNT(*) AS n_links FROM (
        SELECT regexp_extract(src, '{host_re}', 1) AS src_host,
               regexp_extract(dst, '{host_re}', 1) AS dst_host
        FROM links)
      WHERE src_host != dst_host
      GROUP BY src_host, dst_host),
    nodes AS (
      SELECT DISTINCT host FROM (
        SELECT src_host AS host FROM g
        UNION ALL SELECT dst_host FROM g)),
    outw AS (
      SELECT src_host, CAST({_SCALE} // COUNT(*) AS BIGINT) AS w
      FROM g GROUP BY src_host),
    ew AS (
      SELECT g.src_host, g.dst_host, outw.w
      FROM g JOIN outw USING (src_host)),
    pr0 AS (SELECT host, CAST({_SCALE} AS BIGINT) AS pr FROM nodes),
    {",".join(rounds)}
    SELECT n.host,
           COALESCE(od.out_deg, 0) AS out_deg,
           COALESCE(id.in_deg, 0) AS in_deg,
           COALESCE(id.n_inlinks, 0) AS n_inlinks,
           pr{_N_ITER}.pr AS pr
    FROM nodes n
    JOIN pr{_N_ITER} ON n.host = pr{_N_ITER}.host
    LEFT JOIN (SELECT src_host AS host, COUNT(*) AS out_deg
               FROM g GROUP BY src_host) od ON n.host = od.host
    LEFT JOIN (SELECT dst_host AS host, COUNT(*) AS in_deg,
                      CAST(SUM(n_links) AS BIGINT) AS n_inlinks
               FROM g GROUP BY dst_host) id ON n.host = id.host
    """


@register("graph_pagerank", _oracle_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-graph centrality: JVM anchor extraction, one
    corpus shuffle into the distinct host graph, then 5 fixed-point
    PageRank rounds (one join + one partial-agg sum each, lineage cut per
    round). Ranks are exact BIGINTs — oracle-checked bit-for-bit against
    a chained-CTE replay. Output: (host, out_deg, in_deg, n_inlinks, pr)."""
    from gnarly_spark.operators.graph import host_rank_report

    return host_rank_report(
        _pages_df(spark, sf_dir), n_iter=_N_ITER, scale=_SCALE
    )


def _census_oracle() -> str:
    from gnarly_spark.operators.graph import HOST_RE, HREF_RE

    href_re = HREF_RE.replace("'", "''")
    return f"""
    WITH ev AS (SELECT event_id, user_id,
                  CASE event_type WHEN 'signup' THEN 'insert'
                                  WHEN 'purchase' THEN 'delete'
                                  WHEN 'error' THEN 'revert'
                                  ELSE 'update' END AS op
                FROM events),
    pages AS ({_PAGES_SQL.replace("FROM events", "")}
              FROM ev WHERE op IN ('insert', 'update')),
    links AS (
      SELECT src, dst FROM (
        SELECT url AS src,
               unnest(regexp_extract_all(html, '{href_re}', 1)) AS dst
        FROM pages)
      WHERE regexp_extract(dst, '{HOST_RE}', 1) != '')
    SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links FROM (
      SELECT regexp_extract(src, '{HOST_RE}', 1) AS src_host,
             regexp_extract(dst, '{HOST_RE}', 1) AS dst_host
      FROM links)
    WHERE src_host != dst_host
    GROUP BY src_host, dst_host
    """


@register("graph_link_census_stream", _census_oracle())
def graph_link_census_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link census maintained INSIDE the streaming engine, oracle-
    checked: a changelog of multi-host crawled pages (html bodies with
    anchors, derived from events) is drained by the real checkpointed
    CdcIngestPipeline in 3 micro-batches with link_census_reducer
    attached; the folded per-batch censuses must equal one batch collapse
    over all insert/update pages (census is observational — reverts
    don't un-crawl, deletes carry no html, and the pipeline hands reducers
    the RAW batch before revert adjudication). Proves a USER reducer with
    a net-new operator runs exactly-once through the engine loop
    (reference: N ReducerRunners over one source, Gnarly.ts:22-28)."""
    import math
    import os
    import tempfile
    import time

    from gnarly_spark.fixtures import CHANGELOG_DDL
    from gnarly_spark.operators.graph import (
        link_census_read,
        link_census_reducer,
    )
    from gnarly_spark.streaming.pipeline import CdcIngestPipeline

    work = tempfile.mkdtemp(prefix="gnarly_census_stream_")
    cl_dir = os.path.join(work, "changelog")
    eid = F.col("event_id")
    url, html = _page_cols()
    op = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .when(F.col("event_type") == "error", "revert")
        .otherwise("update")
    )
    # url/html are pure functions of the events row, so the changelog can
    # carry the page body inline (what a crawler's fetch payload would be)
    log = _t(spark, sf_dir, "events").select(
        eid.alias("op_seq"),
        (eid / 50).cast("long").alias("block_id"),
        (eid / 50).cast("long").cast("string").alias("block_hash"),
        F.lit(None).cast("string").alias("parent_hash"),
        op.alias("op"),
        url.alias("url"),
        F.col("ts").alias("warc_ts"),
        F.when(op.isin("insert", "update"), F.encode(html, "UTF-8")).alias(
            "html"
        ),
        F.lit(None).cast("string").alias("lang"),
        F.when(
            (F.col("event_type") == "error") & (eid >= 50),
            ((eid / 50).cast("long") - 1).cast("string"),
        ).alias("revert_of_block"),
        F.lit(None).cast("string").alias("reason"),
    )
    mx = log.agg(F.max("op_seq")).collect()[0][0]  # scalar only
    n_chunks = 3
    step = math.ceil((mx + 1) / n_chunks)
    for i in range(n_chunks):
        log.where(
            (F.col("op_seq") >= i * step) & (F.col("op_seq") < (i + 1) * step)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(cl_dir, f"chunk={i:04d}")
        )
    # FileStreamSource orders by MTIME — stamp files in chunk order so
    # micro-batches honor the changelog's total-order contract
    base, n = time.time() - 1000, 0
    for i in range(n_chunks):
        cdir = os.path.join(cl_dir, f"chunk={i:04d}")
        for fn in sorted(os.listdir(cdir)):
            if fn.endswith(".parquet"):
                os.utime(os.path.join(cdir, fn), (base + 2 * n, base + 2 * n))
                n += 1
    red = link_census_reducer()
    pipe = CdcIngestPipeline(
        spark, os.path.join(work, "wd"), with_text=False, reducers=[red]
    )
    pipe.start(
        cl_dir,
        available_now=True,
        max_files_per_trigger=1,
        schema=CHANGELOG_DDL,
    ).awaitTermination()
    assert len(pipe.metrics()) >= n_chunks  # really ran incrementally
    return link_census_read(red, pipe)


# ---------------------------------------------------------------------------
# URL canonicalization census (functions/url.py)
# ---------------------------------------------------------------------------

#: messy-spelling variants of the same crawled page, single-sourced between
#: the Spark build and the DuckDB oracle. Tokens: H = host id string
#: ((event_id%150)%23), P = page key string (event_id%150), G = fragment id
#: string (event_id%5); everything else is a literal. Variant = event_id%7.
_URL_VARIANTS: list[list[str]] = [
    ["HTTPS://H", "H", ".Example.com/p/", "P"],          # case + scheme case
    ["https://h", "H", ".example.com:443/p/", "P"],      # default port
    ["https://h", "H", ".example.com/p/", "P", "#sec-", "G"],  # fragment
    ["https://h", "H", ".example.com/p/", "P", "/?utm_source=feed&b=2&a=1"],
    ["https://h", "H", ".example.com/p/", "P", "/"],     # trailing slash
    ["https://h", "H", ".example.com/p/", "P", "?b=2&a=1&utm_campaign=x"],
    ["javascript:void(", "P", ")"],                      # not a URL -> NULL
]


def _messy_url_col() -> F.Column:
    eid = F.col("event_id")
    tok = {
        "H": ((eid % 150) % 23).cast("string"),
        "P": (eid % 150).cast("string"),
        "G": (eid % 5).cast("string"),
    }
    expr = None
    for i, parts in enumerate(_URL_VARIANTS):
        built = F.concat(*[tok.get(p, F.lit(p)) for p in parts])
        expr = F.when(eid % 7 == i, built) if expr is None else expr.when(
            eid % 7 == i, built
        )
    return expr


def _messy_url_sql() -> str:
    tok = {
        "H": "CAST((event_id % 150) % 23 AS VARCHAR)",
        "P": "CAST(event_id % 150 AS VARCHAR)",
        "G": "CAST(event_id % 5 AS VARCHAR)",
    }
    arms = []
    for i, parts in enumerate(_URL_VARIANTS):
        built = " || ".join(tok.get(p, f"'{p}'") for p in parts)
        arms.append(f"WHEN {i} THEN {built}")
    return f"CASE event_id % 7 {' '.join(arms)} END"


def _url_oracle() -> str:
    from gnarly_spark.functions.url import canonicalize_url_sql, url_host_sql

    return f"""
    WITH raw AS (SELECT {_messy_url_sql()} AS raw_url FROM events),
    c AS (SELECT raw_url,
                 {canonicalize_url_sql("raw_url")} AS canonical_url,
                 {url_host_sql("raw_url")} AS host
          FROM raw)
    SELECT canonical_url,
           COUNT(*) AS n_events,
           COUNT(DISTINCT raw_url) AS n_raw_forms,
           COUNT(DISTINCT host) AS n_hosts
    FROM c GROUP BY canonical_url
    """


@register("web_url_canonicalize", _url_oracle())
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization census: messy crawl spellings (case, default
    port, fragment, tracking params, param order, trailing slash, non-URL
    junk) collapse to canonical pages.

    Shape (the no-Expand cascade): dedup raw spellings FIRST with a plain
    count groupBy, so the regex-heavy canonicalize (all JVM regexp/split/
    sort — functions/url.py) runs once per DISTINCT spelling instead of
    once per event; then roll (canonical, host) -> canonical with plain
    sums/counts. Two distinct-count aggregates in one groupBy would put a
    3x Expand on an event-sized shuffle — this cascade shuffles the event
    relation once (narrow count rows) and everything after is
    distinct-spelling-sized. host/canonical are functions of raw_url, so
    the cascade is exact (count of (canonical,host) groups == COUNT
    (DISTINCT host), NULL hosts excluded to match the oracle)."""
    from gnarly_spark.functions.url import canonicalize_url, url_host

    raw = _t(spark, sf_dir, "events").select(_messy_url_col().alias("raw_url"))
    raw_counts = raw.groupBy("raw_url").agg(F.count("*").alias("n"))
    c = raw_counts.select(
        "raw_url",
        "n",
        canonicalize_url(F.col("raw_url")).alias("canonical_url"),
        url_host(F.col("raw_url")).alias("host"),
    )
    per_host = c.groupBy("canonical_url", "host").agg(
        F.sum("n").alias("n"), F.count("raw_url").alias("n_raw")
    )
    return per_host.groupBy("canonical_url").agg(
        F.sum("n").alias("n_events"),
        F.sum("n_raw").alias("n_raw_forms"),
        F.count("host").alias("n_hosts"),
    )


# ---------------------------------------------------------------------------
# Registrable-domain census (functions/url.py registrable_domain)
# ---------------------------------------------------------------------------

#: synthetic crawl hosts spanning the suffix classes, single-sourced between
#: the Spark build and the oracle. Tokens: S = 'site' || event_id%37,
#: B = 'b' || event_id%11; variant = event_id % 6.
_HOST_VARIANTS: list[list[str]] = [
    ["www.", "S", ".co.uk"],          # 2-label ccTLD registry suffix
    ["S", ".github.io"],              # private hosting suffix, host == site
    ["B", ".s3.amazonaws.com"],       # 3-label suffix
    ["deep.x.", "S", ".com.au"],      # deep subdomain under 2-label suffix
    ["co.uk"],                        # IS a public suffix -> NULL domain
    ["S", ".org"],                    # plain gTLD -> last 2 labels
]


def _crawl_host_col() -> F.Column:
    eid = F.col("event_id")
    tok = {
        "S": F.concat(F.lit("site"), (eid % 37).cast("string")),
        "B": F.concat(F.lit("b"), (eid % 11).cast("string")),
    }
    expr = None
    for i, parts in enumerate(_HOST_VARIANTS):
        built = F.concat(*[tok.get(p, F.lit(p)) for p in parts])
        expr = F.when(eid % 6 == i, built) if expr is None else expr.when(
            eid % 6 == i, built
        )
    return expr


def _crawl_host_sql() -> str:
    tok = {
        "S": "'site' || CAST(event_id % 37 AS VARCHAR)",
        "B": "'b' || CAST(event_id % 11 AS VARCHAR)",
    }
    arms = []
    for i, parts in enumerate(_HOST_VARIANTS):
        built = " || ".join(tok.get(p, f"'{p}'") for p in parts)
        arms.append(f"WHEN {i} THEN {built}")
    return f"CASE event_id % 6 {' '.join(arms)} END"


def _domain_oracle() -> str:
    from gnarly_spark.functions.url import registrable_domain_sql

    return f"""
    WITH raw AS (SELECT {_crawl_host_sql()} AS host FROM events),
    hc AS (SELECT host, COUNT(*) AS n FROM raw GROUP BY host),
    d AS (SELECT host, n, {registrable_domain_sql("host")} AS domain FROM hc)
    SELECT domain,
           CAST(SUM(n) AS BIGINT) AS n_pages,
           COUNT(host) AS n_hosts
    FROM d GROUP BY domain
    """


@register("web_registrable_domain", _domain_oracle())
def web_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain ("site") census: hosts collapse to their eTLD+1
    under the embedded public-suffix subset (functions/url.py
    registrable_domain) — the grouping key per-site dedup budgets and
    domain caps need; plain last-2-labels would merge every .co.uk site.

    Same no-Expand cascade as web_url_canonicalize: count DISTINCT host
    spellings first (event-sized shuffle of narrow count rows), run the
    regexp+InSet suffix resolution once per distinct host, then roll
    (domain, host) -> domain with plain sums. Hosts that ARE a public
    suffix land in the NULL-domain group (both engines group NULLs)."""
    from gnarly_spark.functions.url import registrable_domain

    raw = _t(spark, sf_dir, "events").select(_crawl_host_col().alias("host"))
    hc = raw.groupBy("host").agg(F.count("*").alias("n"))
    d = hc.select("host", "n", registrable_domain(F.col("host")).alias("domain"))
    return d.groupBy("domain").agg(
        F.sum("n").cast("bigint").alias("n_pages"),
        F.count("host").alias("n_hosts"),
    )


# ---------------------------------------------------------------------------
# Anchor-text census (operators/graph.py anchor_text_census)
# ---------------------------------------------------------------------------

_ANCHOR_PAGES_SQL = """
    SELECT '<p>x</p>'
             || '<a href="https://h' || CAST(event_id % 23 AS VARCHAR)
                || '.example/p/' || CAST(event_id % 101 AS VARCHAR)
                || '">w' || CAST(event_id % 13 AS VARCHAR)
                || ' w' || CAST((event_id * 3) % 17 AS VARCHAR) || '</a>'
             || CASE WHEN event_id % 3 = 0
                     THEN '<a href=''https://h'
                          || CAST((event_id * 7) % 23 AS VARCHAR)
                          || '.example/q'' rel=nofollow>Page  '
                          || CAST(event_id % 5 AS VARCHAR) || '</a>'
                     ELSE '' END
             || CASE WHEN event_id % 5 = 0
                     THEN '<a href="/rel/skip">skip</a>' ELSE '' END
             || CASE WHEN event_id % 7 = 0
                     THEN '<a href="https://h' || CAST(event_id % 23 AS VARCHAR)
                          || '.example/e"></a>' ELSE '' END AS html
    FROM events
"""


def _anchor_pages_col() -> F.Column:
    eid = F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    main = F.concat(
        F.lit('<a href="https://h'), s(eid % 23), F.lit(".example/p/"),
        s(eid % 101), F.lit('">w'), s(eid % 13), F.lit(" w"),
        s((eid * 3) % 17), F.lit("</a>"),
    )
    second = F.when(
        eid % 3 == 0,
        F.concat(
            F.lit("<a href='https://h"), s((eid * 7) % 23),
            F.lit(".example/q' rel=nofollow>Page  "), s(eid % 5),
            F.lit("</a>"),
        ),
    ).otherwise(F.lit(""))
    rel = F.when(eid % 5 == 0, F.lit('<a href="/rel/skip">skip</a>')).otherwise(
        F.lit("")
    )
    empty = F.when(
        eid % 7 == 0,
        F.concat(
            F.lit('<a href="https://h'), s(eid % 23), F.lit('.example/e"></a>')
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.lit("<p>x</p>"), main, second, rel, empty)


def _anchor_pairs_sql(pages_cte: str) -> str:
    """Shared oracle fragment: tags + normalized (dst_url, anchor) pairs
    over a pages CTE — single-sourced so the census oracle and the
    curation-pipeline oracle can never drift on the extraction rules."""
    from gnarly_spark.operators.graph import ATAG_RE, ATEXT_RE, HREF_RE, HOST_RE

    tag_re = ATAG_RE.replace("'", "''")
    href_re = HREF_RE.replace("'", "''")
    return f"""
    tags AS (SELECT unnest(regexp_extract_all(html, '{tag_re}', 0)) AS tag
             FROM {pages_cte}),
    pairs AS (SELECT dst_url, anchor FROM (
                SELECT regexp_extract(tag, '{href_re}', 1) AS dst_url,
                       trim(regexp_replace(lower(
                           regexp_extract(tag, '{ATEXT_RE}', 1)),
                           '\\s+', ' ', 'g')) AS anchor
                FROM tags)
              WHERE regexp_extract(dst_url, '{HOST_RE}', 1) != ''
                AND anchor != '')"""


def _anchor_oracle() -> str:
    return f"""
    WITH pages AS ({_ANCHOR_PAGES_SQL}),
    {_anchor_pairs_sql("pages")},
    pa AS (SELECT dst_url, anchor, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
    r AS (SELECT dst_url, anchor, n,
                 row_number() OVER (PARTITION BY dst_url
                                    ORDER BY n DESC, anchor DESC) AS rn,
                 CAST(SUM(n) OVER (PARTITION BY dst_url) AS BIGINT)
                     AS n_mentions,
                 COUNT(*) OVER (PARTITION BY dst_url) AS n_anchor_forms
          FROM pa)
    SELECT dst_url, n_mentions, n_anchor_forms, anchor AS top_anchor,
           n AS top_n
    FROM r WHERE rn = 1
    """


@register("web_anchor_text", _anchor_oracle())
def web_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text census over synthesized crawl pages (operators/graph.py
    anchor_text_census): per link target, mention count, distinct
    normalized phrasings, and the dominant phrasing — the web's own
    description of each page. Relative hrefs and empty anchors drop;
    anchor text is whitespace-normalized + lowercased; the dominant
    phrasing is a max(struct) partial aggregate, not a corpus window."""
    from gnarly_spark.operators.graph import anchor_text_census

    pages = _t(spark, sf_dir, "events").select(
        _anchor_pages_col().alias("html")
    )
    return anchor_text_census(pages, html_col="html")


# ---------------------------------------------------------------------------
# Robots-policy gate (functions/url.py robots_filter)
# ---------------------------------------------------------------------------

_ROBOTS_URLS_SQL = """
    SELECT DISTINCT 'https://h' || CAST(event_id % 23 AS VARCHAR)
        || '.example'
        || CASE event_id % 4
             WHEN 0 THEN '/p/' || CAST(event_id % 101 AS VARCHAR)
             WHEN 1 THEN '/admin/x' || CAST(event_id % 7 AS VARCHAR)
             WHEN 2 THEN '/admin/pub/y'
             ELSE '/q' END AS url
    FROM events
"""

_ROBOTS_RULES_SQL = """
    SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example' AS host,
           '/admin' AS prefix, FALSE AS allow
    FROM nation WHERE n_nationkey < 23
    UNION ALL
    SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example',
           '/admin/pub', TRUE
    FROM nation WHERE n_nationkey < 23 AND n_nationkey % 3 = 0
    UNION ALL
    SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example', '/', FALSE
    FROM nation WHERE n_nationkey < 23 AND n_nationkey % 5 = 0
"""


def _robots_urls_col() -> F.Column:
    eid = F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731
    path = (
        F.when(eid % 4 == 0, F.concat(F.lit("/p/"), s(eid % 101)))
        .when(eid % 4 == 1, F.concat(F.lit("/admin/x"), s(eid % 7)))
        .when(eid % 4 == 2, F.lit("/admin/pub/y"))
        .otherwise(F.lit("/q"))
    )
    return F.concat(F.lit("https://h"), s(eid % 23), F.lit(".example"), path)


def _robots_rules_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("h"), F.col("n_nationkey").cast("string"), F.lit(".example")
        ).alias("host"),
        F.col("n_nationkey").alias("k"),
    ).where(F.col("k") < 23)
    deny_admin = n.select("host", F.lit("/admin").alias("prefix"),
                          F.lit(False).alias("allow"))
    allow_pub = n.where(F.col("k") % 3 == 0).select(
        "host", F.lit("/admin/pub").alias("prefix"), F.lit(True).alias("allow")
    )
    deny_all = n.where(F.col("k") % 5 == 0).select(
        "host", F.lit("/").alias("prefix"), F.lit(False).alias("allow")
    )
    return deny_admin.unionByName(allow_pub).unionByName(deny_all)


@register(
    "web_robots_filter",
    f"""
    WITH urls AS ({_ROBOTS_URLS_SQL}),
    u AS (SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path
          FROM urls),
    rules AS ({_ROBOTS_RULES_SQL}),
    cand AS (SELECT u.url, r.prefix, r.allow,
                    CASE WHEN r.prefix IS NULL THEN NULL
                         ELSE length(r.prefix) END AS l
             FROM u LEFT JOIN rules r
               ON r.host = u.host AND starts_with(u.path, r.prefix)),
    best AS (SELECT url, prefix, allow,
                    row_number() OVER (PARTITION BY url
                        ORDER BY l DESC NULLS LAST,
                                 CAST(allow AS INT) DESC,
                                 prefix DESC) AS rn
             FROM cand)
    SELECT url, COALESCE(allow, TRUE) AS allowed,
           prefix AS matched_prefix
    FROM best WHERE rn = 1
    """,
)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-policy verdicts (functions/url.py robots_filter — RFC 9309
    longest-prefix-match, allow wins ties, no rule = allowed) over
    synthesized crawl URLs with a nation-derived per-host rules corpus:
    /admin denied everywhere, /admin/pub re-allowed on every third host,
    every fifth host denied outright. The Spark side is map-only (per-host
    rule arrays broadcast, array_max verdict — zero corpus shuffles); the
    oracle takes the join+window shape (same answer, test-scale only)."""
    from gnarly_spark.functions.url import robots_filter

    urls = (
        _t(spark, sf_dir, "events")
        .select(_robots_urls_col().alias("url"))
        .distinct()
    )
    return robots_filter(urls, _robots_rules_df(spark, sf_dir)).select(
        "url", "allowed", "matched_prefix"
    )


# ---------------------------------------------------------------------------
# Composed web-curation pipeline (robots -> domain -> anchor enrich)
# ---------------------------------------------------------------------------


def _web_curation_oracle() -> str:
    from gnarly_spark.functions.url import registrable_domain_sql

    return f"""
    WITH urls AS ({_ROBOTS_URLS_SQL}),
    u AS (SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path
          FROM urls),
    rules AS ({_ROBOTS_RULES_SQL}),
    cand AS (SELECT u.url, u.host, r.allow,
                    CASE WHEN r.prefix IS NULL THEN NULL
                         ELSE length(r.prefix) END AS l, r.prefix
             FROM u LEFT JOIN rules r
               ON r.host = u.host AND starts_with(u.path, r.prefix)),
    best AS (SELECT url, host, allow,
                    row_number() OVER (PARTITION BY url
                        ORDER BY l DESC NULLS LAST,
                                 CAST(allow AS INT) DESC,
                                 prefix DESC) AS rn
             FROM cand),
    verdict AS (SELECT url, host, COALESCE(allow, TRUE) AS allowed
                FROM best WHERE rn = 1),
    apages AS ({_ANCHOR_PAGES_SQL}),
    {_anchor_pairs_sql("apages")},
    cens AS (SELECT dst_url AS url, CAST(COUNT(*) AS BIGINT) AS n_mentions
             FROM pairs GROUP BY 1),
    jm AS (SELECT v.url, v.host, v.allowed, c.n_mentions
           FROM verdict v LEFT JOIN cens c USING (url)),
    d AS (SELECT *, {registrable_domain_sql("host")} AS domain FROM jm)
    SELECT domain,
           COUNT(*) AS n_urls,
           CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_allowed,
           CAST(COUNT(CASE WHEN allowed AND n_mentions IS NOT NULL
                           THEN TRUE END) AS BIGINT) AS n_mentioned,
           CAST(SUM(CASE WHEN allowed THEN COALESCE(n_mentions, 0)
                         ELSE 0 END) AS BIGINT) AS inbound_mentions
    FROM d GROUP BY domain
    """


@register("pipeline_web_curation", _web_curation_oracle())
def pipeline_web_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round's web ops COMPOSED, per-domain: crawl URLs -> robots
    verdicts (broadcast map-only gate) -> inbound anchor-mention enrich
    (census join on the canonical target) -> registrable-domain rollup
    (pages / allowed / externally-mentioned / total inbound mentions) —
    the crawl-side twin of pipeline_training_corpus: each stage is the
    already-oracle-checked operator; this row proves the joins stay on
    url, the rules relation broadcasts (the census side is corpus-sized
    at crawl scale — AQE picks broadcast here, shuffle-hash there), and
    nothing recomputes the page stream twice."""
    from gnarly_spark.functions.url import (
        registrable_domain,
        robots_filter,
        url_host,
    )
    from gnarly_spark.operators.graph import anchor_text_census

    ev = _t(spark, sf_dir, "events")
    urls = ev.select(_robots_urls_col().alias("url")).distinct()
    verdicts = robots_filter(urls, _robots_rules_df(spark, sf_dir))
    census = anchor_text_census(
        ev.select(_anchor_pages_col().alias("html"))
    ).select(F.col("dst_url").alias("url"), "n_mentions")
    j = verdicts.join(census, "url", "left").withColumn(
        "domain", registrable_domain(url_host(F.col("url")))
    )
    return j.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("allowed").cast("bigint")).cast("bigint").alias("n_allowed"),
        F.count(
            F.when(F.col("allowed") & F.col("n_mentions").isNotNull(), True)
        ).alias("n_mentioned"),
        F.sum(
            F.when(F.col("allowed"), F.coalesce("n_mentions", F.lit(0)))
            .otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("inbound_mentions"),
    )


# ---------------------------------------------------------------------------
# robots.txt parsing (functions/url.py parse_robots)
# ---------------------------------------------------------------------------

_ROBOTS_BODY_SQL = """
    SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example' AS host,
           '# crawler policy' || chr(10)
           || 'User-agent: googlebot' || chr(10)
           || 'Disallow: /g' || CAST(n_nationkey % 3 AS VARCHAR) || chr(10)
           || 'User-Agent: *' || chr(10)
           || 'Disallow: /admin   # inline' || chr(10)
           || 'ALLOW: /admin/pub' || CAST(n_nationkey % 5 AS VARCHAR)
              || chr(10)
           || 'Disallow:' || chr(10)
           || CASE WHEN n_nationkey % 2 = 0
                   THEN 'User-agent: bingbot' || chr(10)
                        || 'user-agent: *' || chr(10)
                        || 'Disallow: /tmp' || chr(10)
                   ELSE '' END AS body
    FROM nation
"""


def _robots_body_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("n_nationkey")
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.concat(
        F.lit("# crawler policy\nUser-agent: googlebot\nDisallow: /g"),
        s(k % 3),
        F.lit("\nUser-Agent: *\nDisallow: /admin   # inline\nALLOW: /admin/pub"),
        s(k % 5),
        F.lit("\nDisallow:\n"),
        F.when(
            k % 2 == 0,
            F.lit("User-agent: bingbot\nuser-agent: *\nDisallow: /tmp\n"),
        ).otherwise(F.lit("")),
    )
    return _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("h"), s(k), F.lit(".example")).alias("host"),
        body.alias("body"),
    )


@register(
    "web_parse_robots",
    f"""
    WITH f AS ({_ROBOTS_BODY_SQL}),
    ls AS (SELECT host,
                  string_split(regexp_replace(body, chr(13), '', 'g'),
                               chr(10)) AS l
           FROM f),
    ln AS (SELECT host, u.pos AS pos, u.line AS line FROM (
             SELECT host,
                    unnest([struct_pack(pos := i, line := l[i])
                            for i in range(1, len(l) + 1)]) AS u
             FROM ls)),
    c AS (SELECT host, pos,
                 lower(regexp_extract(trim(regexp_replace(line, '#.*$', '')),
                                      '^([A-Za-z-]+)\\s*:', 1)) AS nm,
                 trim(regexp_extract(trim(regexp_replace(line, '#.*$', '')),
                                     '^[A-Za-z-]+\\s*:\\s*(.*)$', 1)) AS val
          FROM ln),
    d AS (SELECT * FROM c
          WHERE nm IN ('user-agent', 'allow', 'disallow')),
    h AS (SELECT *, CASE WHEN nm = 'user-agent'
                          AND COALESCE(lag(nm) OVER (PARTITION BY host
                                                     ORDER BY pos),
                                       '') != 'user-agent'
                         THEN 1 ELSE 0 END AS hdr
          FROM d),
    g AS (SELECT *, CAST(SUM(hdr) OVER (PARTITION BY host ORDER BY pos)
                         AS BIGINT) AS grp
          FROM h),
    star AS (SELECT DISTINCT host, grp FROM g
             WHERE nm = 'user-agent' AND lower(val) = '*')
    SELECT g.host, val AS prefix, nm = 'allow' AS allow
    FROM g JOIN star USING (host, grp)
    WHERE nm IN ('allow', 'disallow') AND val != ''
    """,
)
def web_parse_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (functions/url.py parse_robots — RFC 9309
    grouping: stacked User-agent headers share a group, '*'-groups only,
    comments/case/empty-value rules) over nation-derived synthetic
    bodies exercising every branch: a non-* group to skip, an inline
    comment, case-varied directive names, an empty Disallow, and a
    second '*' group on even hosts. Feeds robots_filter directly — the
    raw-crawl-to-compliance-gate path end-to-end."""
    from gnarly_spark.functions.url import parse_robots

    return parse_robots(_robots_body_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# SURT keys (functions/url.py surt_key — the CDX index key)
# ---------------------------------------------------------------------------

_SURT_VARIANTS: list[list[str]] = [
    ["https://www.s", "S", ".example.co.uk/a/", "B"],   # www dropped
    ["HTTP://S", "S", ".Example.com:80/b?z=1&a=2"],     # case+default port
    ["https://www.w", "W", ".example.org:8080/"],       # explicit port kept
    ["https://x.y.s", "S", ".example.com/p/", "P", "?utm_source=t&q=", "G"],
    ["not-a-url-", "W"],                                # NULL group
]


def _surt_url_col() -> F.Column:
    eid = F.col("event_id")
    tok = {
        "S": (eid % 37).cast("string"),
        "B": (eid % 11).cast("string"),
        "W": (eid % 13).cast("string"),
        "P": (eid % 101).cast("string"),
        "G": (eid % 5).cast("string"),
    }
    expr = None
    for i, parts in enumerate(_SURT_VARIANTS):
        built = F.concat(*[tok.get(p, F.lit(p)) for p in parts])
        expr = F.when(eid % 5 == i, built) if expr is None else expr.when(
            eid % 5 == i, built
        )
    return expr


def _surt_url_sql() -> str:
    tok = {
        "S": "CAST(event_id % 37 AS VARCHAR)",
        "B": "CAST(event_id % 11 AS VARCHAR)",
        "W": "CAST(event_id % 13 AS VARCHAR)",
        "P": "CAST(event_id % 101 AS VARCHAR)",
        "G": "CAST(event_id % 5 AS VARCHAR)",
    }
    arms = []
    for i, parts in enumerate(_SURT_VARIANTS):
        built = " || ".join(tok.get(p, f"'{p}'") for p in parts)
        arms.append(f"WHEN {i} THEN {built}")
    return f"CASE event_id % 5 {' '.join(arms)} END"


def _surt_oracle() -> str:
    from gnarly_spark.functions.url import canonicalize_url_sql, surt_key_sql

    return f"""
    WITH raw AS (SELECT {_surt_url_sql()} AS raw_url FROM events),
    c AS (SELECT raw_url, {canonicalize_url_sql("raw_url")} AS canon
          FROM raw),
    s AS (SELECT raw_url, canon, {surt_key_sql("canon")} AS surt FROM c)
    SELECT surt, COUNT(*) AS n_urls, COUNT(DISTINCT canon) AS n_canonical
    FROM s GROUP BY surt
    """


@register("web_surt_key", _surt_oracle())
def web_surt_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT-key census (functions/url.py surt_key — the Common Crawl CDX /
    Wayback index key: reversed host labels, www dropped, explicit port
    kept, canonical path+query): messy spellings over four host shapes
    plus non-URL junk (NULL group). Same two-level cascade as
    web_url_canonicalize — no Expand, the canonicalize+surt regex chain
    runs once per distinct spelling."""
    from gnarly_spark.functions.url import _surt_of_canonical, canonicalize_url

    raw = _t(spark, sf_dir, "events").select(_surt_url_col().alias("raw_url"))
    c = raw.groupBy("raw_url").agg(F.count("*").alias("n")).select(
        "n", canonicalize_url(F.col("raw_url")).alias("canon")
    )
    lvl1 = c.withColumn("surt", _surt_of_canonical(F.col("canon"))).groupBy(
        "surt", "canon"
    ).agg(F.sum("n").alias("n"))
    return lvl1.groupBy("surt").agg(
        F.sum("n").cast("bigint").alias("n_urls"),
        F.count("canon").alias("n_canonical"),
    )


# ---------------------------------------------------------------------------
# sitemap discovery (sources/sitemap.py)
# ---------------------------------------------------------------------------

# Per-URL sitemap relation derived from `events`, single-sourced between the
# Spark build and the DuckDB oracle. uid = event_id % 997 (richer than the
# tiny user_id space), host = uid % 13, crawl = the url's observed last
# crawl MAX(ts). Rules:
#   url        'https://s/' || uid, plus '?a=1&b=2' when uid%6=0 (the query
#              string forces &amp; entity escaping through the XML hop)
#   lastmod    absent when uid%11=3; DATE-ONLY (date(crawl)+2d) when uid%4=0;
#              full UTC (crawl+3h) when uid%5=0; else crawl-1h (fresh)
#   changefreq daily/weekly/monthly/yearly by uid%5, absent on 4
#   priority   '0.'||(uid%10) when uid%3!=1, absent otherwise
#   ghost      uid%9=0 additionally lists 'https://s/g'||uid — in the
#              sitemap, never crawled (the discovery case)


def _sitemap_entries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    uid = (F.col("event_id") % 997).alias("uid")
    crawl = e.select(uid, F.col("ts")).groupBy("uid").agg(F.max("ts").alias("crawl"))
    u = F.col("uid")
    url = F.concat(
        F.lit("https://s/"),
        u.cast("string"),
        F.when(u % 6 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    full = lambda ts: F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    lastmod = (
        F.when(u % 11 == 3, F.lit(None).cast("string"))
        .when(u % 4 == 0, F.date_format(F.date_add(F.to_date("crawl"), 2), "yyyy-MM-dd"))
        .when(u % 5 == 0, full(F.col("crawl") + F.expr("INTERVAL 3 HOURS")))
        .otherwise(full(F.col("crawl") - F.expr("INTERVAL 1 HOURS")))
    )
    changefreq = (
        F.when(u % 5 == 0, "daily")
        .when(u % 5 == 1, "weekly")
        .when(u % 5 == 2, "monthly")
        .when(u % 5 == 3, "yearly")
    )
    priority = F.when(u % 3 != 1, F.concat(F.lit("0."), (u % 10).cast("string")))
    base = crawl.select(
        (u % 13).cast("int").alias("host_id"),
        u.alias("ord"),
        url.alias("loc"),
        lastmod.alias("lastmod"),
        changefreq.alias("changefreq"),
        priority.alias("priority"),
    )
    ghost = crawl.where(u % 9 == 0).select(
        (u % 13).cast("int").alias("host_id"),
        (u + 100000).alias("ord"),
        F.concat(F.lit("https://s/g"), u.cast("string")).alias("loc"),
        F.lit("2026-03-01T00:00:00Z").alias("lastmod"),
        F.lit("weekly").alias("changefreq"),
        F.lit("0.5").alias("priority"),
    )
    return base.unionByName(ghost)


_SITEMAP_ENTRIES_SQL = """
    WITH crawl AS (
        SELECT event_id % 997 AS uid, MAX(ts) AS crawl
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT CAST(uid % 13 AS INT) AS host_id,
               'https://s/' || CAST(uid AS VARCHAR)
                 || CASE WHEN uid % 6 = 0 THEN '?a=1&b=2' ELSE '' END AS loc,
               CASE WHEN uid % 11 = 3 THEN NULL
                    WHEN uid % 4 = 0
                      THEN strftime(CAST(crawl AS DATE) + 2, '%Y-%m-%d')
                    WHEN uid % 5 = 0
                      THEN strftime(crawl + INTERVAL 3 HOUR, '%Y-%m-%dT%H:%M:%SZ')
                    ELSE strftime(crawl - INTERVAL 1 HOUR, '%Y-%m-%dT%H:%M:%SZ')
               END AS lastmod,
               CASE uid % 5 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                            WHEN 2 THEN 'monthly' WHEN 3 THEN 'yearly' END
                 AS changefreq,
               CASE WHEN uid % 3 != 1
                    THEN '0.' || CAST(uid % 10 AS VARCHAR) END AS priority
        FROM crawl
    ),
    ghost AS (
        SELECT CAST(uid % 13 AS INT) AS host_id,
               'https://s/g' || CAST(uid AS VARCHAR) AS loc,
               '2026-03-01T00:00:00Z' AS lastmod,
               'weekly' AS changefreq,
               '0.5' AS priority
        FROM crawl WHERE uid % 9 = 0
    )
    SELECT * FROM base UNION ALL SELECT * FROM ghost
"""


@register(
    "web_sitemap_parse",
    f"""
    WITH entries AS ({_SITEMAP_ENTRIES_SQL})
    SELECT host_id, loc, lastmod,
           CASE WHEN lastmod IS NULL THEN NULL
                WHEN LENGTH(lastmod) = 10 THEN lastmod || ' 00:00:00'
                ELSE strftime(strptime(lastmod, '%Y-%m-%dT%H:%M:%SZ'),
                              '%Y-%m-%d %H:%M:%S')
           END AS lastmod_str,
           changefreq,
           CAST(priority AS DOUBLE) AS priority
    FROM entries
    """,
)
def web_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap boundary end-to-end: the per-url relation is rendered into
    one urlset XML document per host (entity-escaped locs, optional
    lastmod/changefreq/priority tags), then parsed back by the JVM
    split+regexp parser — every entry must survive the XML hop exactly
    (decoded loc with its query string, both W3C lastmod forms parsed to
    the right timestamp, absent tags as NULLs). Oracle = the same relation
    straight off events (the XML hop must be invisible). Covers
    sources/sitemap.py — the crawl-discovery input the recrawl scheduler
    consumes."""
    from gnarly_spark.sources.sitemap import parse_sitemap, render_sitemap

    entries = _sitemap_entries_df(spark, sf_dir)
    xml = render_sitemap(
        entries,
        group_cols=["host_id"],
        loc_col="loc",
        order_col="ord",
        lastmod_col="lastmod",
        changefreq_col="changefreq",
        priority_col="priority",
    )
    parsed = parse_sitemap(xml)
    return parsed.select(
        "host_id",
        "loc",
        "lastmod",
        F.date_format("lastmod_ts", "yyyy-MM-dd HH:mm:ss").alias("lastmod_str"),
        "changefreq",
        "priority",
    )


@register(
    "web_sitemap_recrawl",
    f"""
    WITH entries AS ({_SITEMAP_ENTRIES_SQL}),
    crawl AS (
        SELECT 'https://s/' || CAST(event_id % 997 AS VARCHAR) AS url,
               MAX(ts) AS last_crawl_ts
        FROM events GROUP BY 1
    ),
    j AS (
        SELECT e.loc AS url, e.lastmod,
               CASE WHEN e.lastmod IS NULL THEN NULL
                    WHEN LENGTH(e.lastmod) = 10
                      THEN CAST(strptime(e.lastmod, '%Y-%m-%d') AS TIMESTAMP)
                    ELSE strptime(e.lastmod, '%Y-%m-%dT%H:%M:%SZ')
               END AS lastmod_ts,
               c.last_crawl_ts
        FROM entries e LEFT JOIN crawl c ON e.loc = c.url
    )
    SELECT url,
           CASE WHEN last_crawl_ts IS NULL THEN 'new'
                WHEN lastmod_ts > last_crawl_ts THEN 'stale' END AS status,
           lastmod
    FROM j
    WHERE last_crawl_ts IS NULL OR lastmod_ts > last_crawl_ts
    """,
)
def web_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publisher-signal recrawl scheduler: parsed sitemap entries
    joined against observed crawl state — never-crawled locs (ghost pages,
    query-string spellings the crawler has not fetched) come back 'new',
    entries whose lastmod is after the last crawl come back 'stale', and
    fresh/lastmod-less entries are NOT refetched (their cadence belongs to
    the observed-change scheduler, cdc_recrawl_schedule). The sitemap side
    rides the full render->parse XML hop, so this is the two-module
    integration path a production crawl runs. One equi-join; the sitemap
    relation is the small side (AQE broadcast at scale)."""
    from gnarly_spark.sources.sitemap import (
        parse_sitemap,
        recrawl_from_sitemap,
        render_sitemap,
    )

    entries = _sitemap_entries_df(spark, sf_dir)
    xml = render_sitemap(
        entries,
        group_cols=["host_id"],
        loc_col="loc",
        order_col="ord",
        lastmod_col="lastmod",
        changefreq_col="changefreq",
        priority_col="priority",
    )
    parsed = parse_sitemap(xml)
    e = _t(spark, sf_dir, "events")
    crawl_state = (
        e.select(
            F.concat(
                F.lit("https://s/"), (F.col("event_id") % 997).cast("string")
            ).alias("url"),
            "ts",
        )
        .groupBy("url")
        .agg(F.max("ts").alias("last_crawl_ts"))
    )
    return recrawl_from_sitemap(parsed, crawl_state)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (operators/graph.py hits)
# ---------------------------------------------------------------------------


def _hits_oracle() -> str:
    """Chained-CTE replay of hits(): distinct host adjacency, then
    _N_ITER integer rounds of sum + max-normalize, formula-identical to
    operators/graph.py (scale = 10^6, floor divisions)."""
    from gnarly_spark.operators.graph import HOST_RE, HREF_RE

    href_re = HREF_RE.replace("'", "''")
    # normalization via MAX(raw) OVER () — NOT a scalar subquery: a
    # second reference to each round's CTE doubles the inlined expression
    # tree per round under DuckDB's default CTE inlining (2^n blowup, the
    # running-argmin lesson in its DuckDB form); the unpartitioned window
    # keeps the chain strictly linear.
    rounds = []
    for i in range(_N_ITER):
        rounds.append(f"""
    a{i + 1} AS (
      SELECT host, CAST((raw * {_SCALE}) //
        GREATEST(MAX(raw) OVER (), 1) AS BIGINT) AS v
      FROM (
        SELECT n.host, CAST(COALESCE(c.c, 0) AS BIGINT) AS raw
        FROM nodes n LEFT JOIN (
          SELECT e.dst_host AS host, SUM(h{i}.v) AS c
          FROM h{i} JOIN e ON h{i}.host = e.src_host
          GROUP BY e.dst_host) c ON n.host = c.host)),
    h{i + 1} AS (
      SELECT host, CAST((raw * {_SCALE}) //
        GREATEST(MAX(raw) OVER (), 1) AS BIGINT) AS v
      FROM (
        SELECT n.host, CAST(COALESCE(c.c, 0) AS BIGINT) AS raw
        FROM nodes n LEFT JOIN (
          SELECT e.src_host AS host, SUM(a{i + 1}.v) AS c
          FROM a{i + 1} JOIN e ON a{i + 1}.host = e.dst_host
          GROUP BY e.src_host) c ON n.host = c.host))""")
    return f"""
    WITH pages AS ({_PAGES_SQL}),
    links AS (
      SELECT src, dst FROM (
        SELECT url AS src,
               unnest(regexp_extract_all(html, '{href_re}', 1)) AS dst
        FROM pages)
      WHERE regexp_extract(dst, '{HOST_RE}', 1) != ''),
    e AS (
      SELECT DISTINCT src_host, dst_host FROM (
        SELECT regexp_extract(src, '{HOST_RE}', 1) AS src_host,
               regexp_extract(dst, '{HOST_RE}', 1) AS dst_host
        FROM links)
      WHERE src_host != dst_host),
    nodes AS (
      SELECT DISTINCT host FROM (
        SELECT src_host AS host FROM e
        UNION ALL SELECT dst_host FROM e)),
    h0 AS (SELECT host, CAST({_SCALE} AS BIGINT) AS v FROM nodes),
    {",".join(rounds)}
    SELECT n.host, a{_N_ITER}.v AS auth, h{_N_ITER}.v AS hub
    FROM nodes n
    JOIN a{_N_ITER} ON n.host = a{_N_ITER}.host
    JOIN h{_N_ITER} ON n.host = h{_N_ITER}.host
    """


@register("graph_hits", _hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the crawl's host graph: the
    complementary centrality to graph_pagerank (directory-like hosts
    score as hubs, content-like hosts as authorities). Integer
    max-normalized fixed point — exact BIGINTs, oracle-checked
    bit-for-bit against a chained-CTE replay of all 5 rounds. Covers
    operators/graph.py hits."""
    from gnarly_spark.operators.graph import extract_links, hits, host_graph

    g = host_graph(extract_links(_pages_df(spark, sf_dir)))
    return hits(g, n_iter=_N_ITER, scale=_SCALE)


# ---------------------------------------------------------------------------
# robots.txt -> sitemap discovery (functions/url.py robots_sitemaps)
# ---------------------------------------------------------------------------


@register(
    "web_robots_sitemaps",
    f"""
    WITH f AS ({_ROBOTS_BODY_SQL})
    SELECT host, 'https://' || host || '/sitemap.xml' AS sitemap_url FROM f
    UNION ALL
    SELECT host, 'https://' || host || '/sm2.xml' FROM f
    WHERE CAST(regexp_extract(host, 'h(\\d+)', 1) AS INT) % 2 = 0
    """,
)
def web_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt: ``Sitemap:`` declarations
    extracted from the SAME messy robots bodies web_parse_robots parses
    (the directive is group-independent so the rule parser ignores it and
    this extractor ignores the rules) — plus a duplicate declaration that
    must dedup, a lowercase spelling, an inline comment, and a
    colon-less line that must be ignored. Feeds parse_sitemap_index /
    parse_sitemap: the full discovery chain. Covers functions/url.py
    robots_sitemaps."""
    from gnarly_spark.functions.url import robots_sitemaps

    base = _robots_body_df(spark, sf_dir)
    extra = F.concat(
        F.lit("Sitemap: https://"), F.col("host"), F.lit("/sitemap.xml\n"),
        F.lit("Sitemap: https://"), F.col("host"), F.lit("/sitemap.xml\n"),
        F.lit("Sitemap https://"), F.col("host"), F.lit("/no-colon.xml\n"),
        F.when(
            F.regexp_extract("host", r"h(\d+)", 1).cast("int") % 2 == 0,
            F.concat(
                F.lit("sitemap: https://"), F.col("host"),
                F.lit("/sm2.xml   # mirror\n"),
            ),
        ).otherwise(F.lit("")),
    )
    bodies = base.select(
        "host", F.concat(F.col("body"), F.lit("\n"), extra).alias("body")
    )
    return robots_sitemaps(bodies)


# ---------------------------------------------------------------------------
# politeness-aware fetch scheduling (functions/url.py robots_crawl_delay +
# schedule_fetches)
# ---------------------------------------------------------------------------

# crawl-delay lines appended to the shared robots bodies, single-sourced:
#   k%3=0 -> 'Crawl-delay: 2.5'; k%5=0 -> 'crawl-delay: 7' (max wins);
#   k%7=0 -> junk value (ignored); k%4=0 -> 999 (capped at 60); else 1.0
_CRAWL_DELAY_CASE = """
    CASE WHEN k % 4 = 0 THEN 60.0
         WHEN k % 5 = 0 THEN 7.0
         WHEN k % 3 = 0 THEN 2.5
         ELSE 1.0 END
"""


@register(
    "web_fetch_schedule",
    f"""
    WITH due AS (
      SELECT DISTINCT
             'https://h' || CAST(event_id % 25 AS VARCHAR) || '.example/p/'
               || CAST(event_id % 997 AS VARCHAR) AS url,
             'h' || CAST(event_id % 25 AS VARCHAR) || '.example' AS host
      FROM events),
    d AS (SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example' AS host,
                 {_CRAWL_DELAY_CASE.replace("k %", "n_nationkey %")} AS delay_s
          FROM nation)
    SELECT due.url, due.host, d.delay_s,
           CAST(row_number() OVER (PARTITION BY due.host ORDER BY due.url)
                AS INT) AS fetch_seq,
           (CAST(row_number() OVER (PARTITION BY due.host ORDER BY due.url)
                 AS BIGINT) - 1) * d.delay_s AS slot_s
    FROM due JOIN d ON due.host = d.host
    """,
)
def web_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier politeness step end-to-end: per-host
    Crawl-delay budgets parsed from the SAME messy robots bodies (max of
    multiple declarations, junk values ignored, 999 capped at 60,
    undeclared hosts default 1.0), then a due list assigned fetch slots —
    fetch k of a host waits k delays (one window shuffle on host; hosts
    parallelize, per-host serialization IS the politeness contract, the
    public Mercator/Heritrix queue-per-host design). Oracle re-derives
    delays from the generation rules and replays the rank/slot window —
    the robots hop must be invisible. Covers functions/url.py
    robots_crawl_delay + schedule_fetches."""
    from gnarly_spark.functions.url import robots_crawl_delay, schedule_fetches

    k = F.col("n_nationkey")
    base = _robots_body_df(spark, sf_dir)
    extra = F.concat(
        F.when(k % 3 == 0, F.lit("Crawl-delay: 2.5\n")).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.lit("crawl-delay: 7\n")).otherwise(F.lit("")),
        F.when(k % 7 == 0, F.lit("Crawl-delay: soon\n")).otherwise(F.lit("")),
        F.when(k % 4 == 0, F.lit("Crawl-delay: 999\n")).otherwise(F.lit("")),
    )
    # bodies = shared messy robots + the delay lines (single relation)
    bodies = base.join(
        _t(spark, sf_dir, "nation").select(
            F.concat(F.lit("h"), k.cast("string"), F.lit(".example")).alias("host"),
            extra.alias("_extra"),
        ),
        "host",
    ).select("host", F.concat(F.col("body"), F.lit("\n"), F.col("_extra")).alias("body"))
    delays = robots_crawl_delay(bodies)
    e = _t(spark, sf_dir, "events")
    due = e.select(
        F.concat(
            F.lit("https://h"), (F.col("event_id") % 25).cast("string"),
            F.lit(".example/p/"), (F.col("event_id") % 997).cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("event_id") % 25).cast("string"), F.lit(".example")
        ).alias("host"),
    ).distinct()
    return schedule_fetches(due, delays)
