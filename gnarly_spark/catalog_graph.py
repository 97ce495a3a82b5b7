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


def _pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
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
    return e.select(
        F.concat(
            F.lit("https://h"),
            (uid % 23).cast("string"),
            F.lit(".example/p/"),
            uid.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><body><p>t</p>"), a1, a2, rel, F.lit("</body></html>")
        ).alias("html"),
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
