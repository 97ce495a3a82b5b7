"""Sitemap boundary (sources/sitemap.py): render->parse round trip with
entity escaping, optional-tag alignment (the xpath-array misalignment case
the per-block design exists for), both W3C lastmod forms, junk tolerance,
two-level sitemap-index walk, and the publisher-signal recrawl join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gnarly_spark.sources.sitemap import (
    parse_sitemap,
    parse_sitemap_index,
    recrawl_from_sitemap,
    render_sitemap,
    xml_escape,
    xml_unescape,
)


def _entries(spark):
    rows = [
        # (host, ord, loc, lastmod, changefreq, priority)
        ("h1", 1, "https://a.com/p?x=1&y=2", "2026-01-05T10:00:00Z", "daily", "0.9"),
        ("h1", 2, "https://a.com/q", None, None, None),  # every optional absent
        ("h1", 3, "https://a.com/r", "2026-02-01", "weekly", None),  # date-only
        ("h2", 1, "https://b.com/<odd>&'\"", "2026-01-01T00:00:00Z", None, "0.1"),
    ]
    return spark.createDataFrame(
        rows,
        schema="host string, ord int, loc string, lastmod string, "
        "changefreq string, priority string",
    )


def test_render_parse_roundtrip(spark):
    xml = render_sitemap(
        _entries(spark),
        group_cols=["host"],
        order_col="ord",
        changefreq_col="changefreq",
        priority_col="priority",
    )
    assert xml.count() == 2  # one document per host
    doc = {r.host: r.xml for r in xml.collect()}
    # entity escaping on the wire: raw & never appears inside a loc
    assert "x=1&amp;y=2" in doc["h1"]
    assert "&lt;odd&gt;&amp;&apos;&quot;" in doc["h2"]
    got = parse_sitemap(xml).sort("host", "loc").collect()
    assert [r.loc for r in got] == [
        "https://a.com/p?x=1&y=2",
        "https://a.com/q",
        "https://a.com/r",
        "https://b.com/<odd>&'\"",
    ]
    by_loc = {r.loc: r for r in got}
    p = by_loc["https://a.com/p?x=1&y=2"]
    assert p.lastmod_ts == datetime.datetime(2026, 1, 5, 10, 0, 0)
    assert p.changefreq == "daily" and p.priority == 0.9
    q = by_loc["https://a.com/q"]
    # the misalignment case: entry after one WITH optional tags has NULLs,
    # never its neighbor's values
    assert q.lastmod is None and q.lastmod_ts is None
    assert q.changefreq is None and q.priority is None
    r = by_loc["https://a.com/r"]
    assert r.lastmod_ts == datetime.datetime(2026, 2, 1, 0, 0, 0)  # date-only


def test_junk_lastmod_is_null_not_error(spark):
    df = spark.createDataFrame(
        [("h", '<urlset><url><loc>https://a/x</loc>'
          "<lastmod>not-a-date</lastmod></url></urlset>")],
        schema="host string, xml string",
    )
    got = parse_sitemap(df).collect()
    assert len(got) == 1
    assert got[0].lastmod == "not-a-date" and got[0].lastmod_ts is None


def test_entry_without_loc_dropped(spark):
    df = spark.createDataFrame(
        [("h", "<urlset><url><lastmod>2026-01-01</lastmod></url>"
          "<url><loc>https://a/x</loc></url></urlset>")],
        schema="host string, xml string",
    )
    assert [r.loc for r in parse_sitemap(df).collect()] == ["https://a/x"]


def test_sitemap_index_two_level_walk(spark):
    idx = spark.createDataFrame(
        [
            (
                "site",
                '<?xml version="1.0"?><sitemapindex>'
                "<sitemap><loc>https://a.com/sm1.xml</loc>"
                "<lastmod>2026-01-02T00:00:00Z</lastmod></sitemap>"
                "<sitemap><loc>https://a.com/sm2.xml</loc></sitemap>"
                "</sitemapindex>",
            )
        ],
        schema="site string, xml string",
    )
    children = parse_sitemap_index(idx).sort("loc").collect()
    assert [c.loc for c in children] == [
        "https://a.com/sm1.xml",
        "https://a.com/sm2.xml",
    ]
    assert children[0].lastmod_ts == datetime.datetime(2026, 1, 2)
    assert children[1].lastmod is None


def test_xml_escape_unescape_inverse(spark):
    s = spark.createDataFrame(
        [("a&b<c>d\"e'f&amp;g",), ("plain",)], schema="s string"
    )
    back = s.select(
        xml_unescape(xml_escape(F.col("s"))).alias("rt"), "s"
    ).collect()
    assert all(r.rt == r.s for r in back)


def test_recrawl_statuses(spark):
    entries = spark.createDataFrame(
        [
            ("https://a/new", "2026-01-01T00:00:00Z"),
            ("https://a/stale", "2026-01-10T00:00:00Z"),
            ("https://a/fresh", "2026-01-01T00:00:00Z"),
            ("https://a/nolastmod", None),
        ],
        schema="loc string, lastmod string",
    ).select(
        "loc",
        "lastmod",
        F.try_to_timestamp("lastmod", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .cast("timestamp_ntz")
        .alias("lastmod_ts"),
    )
    crawled = spark.createDataFrame(
        [
            ("https://a/stale", datetime.datetime(2026, 1, 5)),
            ("https://a/fresh", datetime.datetime(2026, 1, 5)),
            ("https://a/nolastmod", datetime.datetime(2026, 1, 5)),
        ],
        schema="url string, last_crawl_ts timestamp_ntz",
    )
    got = {r.url: r.status for r in recrawl_from_sitemap(entries, crawled).collect()}
    # fresh + lastmod-less crawled urls are NOT refetched
    assert got == {"https://a/new": "new", "https://a/stale": "stale"}


def test_discovery_chain_robots_to_recrawl(spark):
    """The full publisher-signal chain on synthetic fixtures:
    robots.txt -> Sitemap declarations -> sitemap index -> urlset ->
    recrawl decisions."""
    import datetime

    from gnarly_spark.functions.url import robots_sitemaps

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /tmp\n"
                "Sitemap: https://a.com/smidx.xml\n"
                "Sitemap: https://a.com/smidx.xml\n"  # dup -> one row
                "sitemap: https://a.com/extra.xml  # lowercase+comment\n"
                "Sitemap no-colon-ignored\n",
            )
        ],
        schema="host string, body string",
    )
    sm = robots_sitemaps(robots).sort("sitemap_url").collect()
    assert [r.sitemap_url for r in sm] == [
        "https://a.com/extra.xml",
        "https://a.com/smidx.xml",
    ]
    idx = spark.createDataFrame(
        [
            (
                "a.com",
                "<sitemapindex><sitemap><loc>https://a.com/sm1.xml</loc>"
                "</sitemap></sitemapindex>",
            )
        ],
        schema="host string, xml string",
    )
    children = parse_sitemap_index(idx).collect()
    assert [c.loc for c in children] == ["https://a.com/sm1.xml"]
    urlset = spark.createDataFrame(
        [
            (
                "a.com",
                "<urlset><url><loc>https://a.com/p1</loc>"
                "<lastmod>2026-01-10T00:00:00Z</lastmod></url>"
                "<url><loc>https://a.com/p2</loc></url></urlset>",
            )
        ],
        schema="host string, xml string",
    )
    entries = parse_sitemap(urlset)
    crawled = spark.createDataFrame(
        [("https://a.com/p1", datetime.datetime(2026, 1, 5))],
        schema="url string, last_crawl_ts timestamp_ntz",
    )
    got = {r.url: r.status for r in recrawl_from_sitemap(entries, crawled).collect()}
    assert got == {"https://a.com/p1": "stale", "https://a.com/p2": "new"}


def test_wild_input_never_crashes_ansi(spark):
    """Default-ANSI Spark 4: junk priority and fractional/minute lastmod
    forms must degrade (NULL / parsed), never throw."""
    df = spark.createDataFrame(
        [
            ("h", "<urlset>"
             "<url><loc>https://a/1</loc><priority>high</priority>"
             "<lastmod>2026-01-05T10:00:00.123Z</lastmod></url>"
             "<url><loc>https://a/2</loc><priority>0.7</priority>"
             "<lastmod>2026-01-05T10:00Z</lastmod></url>"
             "<url><loc>https://a/3</loc><priority>1</priority></url>"
             "</urlset>")
        ],
        schema="host string, xml string",
    )
    got = {r.loc: r for r in parse_sitemap(df).collect()}
    assert got["https://a/1"].priority is None  # junk -> NULL, no crash
    assert got["https://a/1"].lastmod_ts == datetime.datetime(
        2026, 1, 5, 10, 0, 0, 123000
    )  # fractional seconds parse
    assert got["https://a/2"].priority == 0.7
    assert got["https://a/2"].lastmod_ts == datetime.datetime(2026, 1, 5, 10, 0)
    assert got["https://a/3"].priority == 1.0  # integer spelling


def test_schedule_fetches_carries_columns_and_default(spark):
    from gnarly_spark.functions.url import schedule_fetches

    due = spark.createDataFrame(
        [("https://a/1", "a", "stale"), ("https://a/2", "a", "new"),
         ("https://b/1", "b", "new")],
        schema="url string, host string, status string",
    )
    delays = spark.createDataFrame([("a", 2.0)], "host string, delay_s double")
    got = {r.url: r for r in schedule_fetches(due, delays, default_delay=5.0).collect()}
    assert got["https://a/2"].status == "new"  # due columns carried
    assert got["https://a/1"].slot_s == 0.0 and got["https://a/2"].slot_s == 2.0
    assert got["https://b/1"].delay_s == 5.0  # caller's default, not 1.0
