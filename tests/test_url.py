"""URL canonicalization (functions/url.py): hand-computed edge cases,
Spark/DuckDB twin parity on those same cases, and the no-Python plan."""

import duckdb
import pyspark.sql.functions as F

from gnarly_spark.functions.url import (
    canonicalize_url,
    canonicalize_url_sql,
    url_host,
    url_host_sql,
)

# (raw, canonical, host) — each exercises one rule from the module docstring
CASES = [
    # scheme/host case, fragment, default port, trailing slash
    ("HTTPS://Ex.COM/A#x", "https://ex.com/A", "ex.com"),
    ("https://ex.com:443/a", "https://ex.com/a", "ex.com"),
    ("http://ex.com:80/", "http://ex.com/", "ex.com"),
    ("http://ex.com:8080/a/", "http://ex.com:8080/a", "ex.com"),
    ("https://ex.com", "https://ex.com/", "ex.com"),
    ("https://ex.com///", "https://ex.com/", "ex.com"),
    # path case preserved; only trailing slashes normalize
    ("https://ex.com/A/B/", "https://ex.com/A/B", "ex.com"),
    # query: tracking dropped, empties dropped, rest byte-sorted
    (
        "https://ex.com/a?z=1&utm_source=t&a=2&gclid=g&&fbclid=f",
        "https://ex.com/a?a=2&z=1",
        "ex.com",
    ),
    ("https://ex.com/a?utm_campaign=x", "https://ex.com/a", "ex.com"),
    ("https://ex.com/a?", "https://ex.com/a", "ex.com"),
    # '?' directly after authority; bare tracking name without '='
    ("https://ex.com?b=1&utm_x", "https://ex.com/?b=1", "ex.com"),
    # utm-lookalike param survives (name is 'utmost', not utm_*)
    ("https://ex.com/a?utmost=1", "https://ex.com/a?utmost=1", "ex.com"),
    # fragment before query: everything after '#' goes, '?' included
    ("https://ex.com/a#f?b=1", "https://ex.com/a", "ex.com"),
    # whitespace trim
    ("  https://ex.com/a  ", "https://ex.com/a", "ex.com"),
    # non-URLs -> NULL
    ("javascript:void(0)", None, None),
    ("mailto:a@b.c", None, None),
    ("/relative/path", None, None),
    ("", None, None),
]


def test_canonicalize_hand_computed(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "raw string")
    got = {
        r["raw"]: (r["c"], r["h"])
        for r in df.select(
            "raw",
            canonicalize_url(F.col("raw")).alias("c"),
            url_host(F.col("raw")).alias("h"),
        ).collect()
    }
    for raw, canon, host in CASES:
        assert got[raw] == (canon, host), raw


def test_sql_twin_matches_spark_on_cases():
    """The DuckDB twin and the expected values agree on every case — the
    driver oracle only covers the 7 generated variants; this pins the
    dialect-parity edges (empty-list join, no-match extract) on the rest."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(raw VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r, _, _ in CASES])
    rows = con.execute(
        f"SELECT raw, {canonicalize_url_sql('raw')}, {url_host_sql('raw')} "
        "FROM t"
    ).fetchall()
    got = {r: (c, h) for r, c, h in rows}
    for raw, canon, host in CASES:
        assert got[raw] == (canon, host), raw


def test_canonicalize_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — required for the
    CDC key: re-ingesting an already-canonical url must not re-key it."""
    df = spark.createDataFrame([(r,) for r, c, _ in CASES if c], "raw string")
    twice = df.select(
        canonicalize_url(F.col("raw")).alias("once"),
        canonicalize_url(canonicalize_url(F.col("raw"))).alias("twice"),
    )
    assert twice.where(F.col("once") != F.col("twice")).count() == 0


def test_canonicalize_plan_stays_jvm(spark):
    df = spark.createDataFrame([("https://ex.com/a?b=1",)], "raw string")
    out = df.select(canonicalize_url(F.col("raw")).alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# (host, registrable domain) — each exercises one resolution branch of
# functions/url.py registrable_domain
DOMAIN_CASES = [
    # plain gTLD: last 2 labels
    ("www.example.org", "example.org"),
    ("example.org", "example.org"),
    ("a.b.c.example.com", "example.com"),
    # 2-label public suffix: last 3 labels
    ("www.site.co.uk", "site.co.uk"),
    ("deep.x.site.com.au", "site.com.au"),
    ("site.github.io", "site.github.io"),
    ("user.blogspot.com", "user.blogspot.com"),
    # 3-label public suffix: last 4 labels
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ("x.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    # host IS a suffix, or too short -> NULL
    ("co.uk", None),
    ("github.io", None),
    ("s3.amazonaws.com", None),
    ("localhost", None),
    ("", None),
    (None, None),
]


def test_registrable_domain_hand_computed(spark):
    from gnarly_spark.functions.url import registrable_domain

    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = dict(
        df.select("host", registrable_domain(F.col("host")).alias("d"))
        .collect()
    )
    for host, want in DOMAIN_CASES:
        assert got[host] == want, host


def test_registrable_domain_sql_twin():
    from gnarly_spark.functions.url import registrable_domain_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t(host VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?)", [(h,) for h, _ in DOMAIN_CASES]
    )
    rows = con.execute(
        f"SELECT host, {registrable_domain_sql('host')} FROM t"
    ).fetchall()
    for host, want in rows:
        assert dict(DOMAIN_CASES)[host] == want, host


def test_registrable_domain_extra_suffixes(spark):
    """extra_2label extends the embedded subset (production loads the full
    PSL file and passes it here)."""
    from gnarly_spark.functions.url import registrable_domain

    df = spark.createDataFrame([("a.b.example.zz",)], "host string")
    base = df.select(registrable_domain(F.col("host")).alias("d")).first()["d"]
    ext = df.select(
        registrable_domain(F.col("host"), extra_2label=("example.zz",)).alias("d")
    ).first()["d"]
    assert base == "example.zz" and ext == "b.example.zz"


def test_registrable_domain_plan_stays_jvm(spark):
    from gnarly_spark.functions.url import registrable_domain

    df = spark.createDataFrame([("www.site.co.uk",)], "host string")
    out = df.select(registrable_domain(F.col("host")).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_robots_filter_longest_prefix_semantics(spark):
    """RFC 9309 resolution: longest prefix wins, allow wins length ties,
    no rule / no matching rule -> allowed."""
    from gnarly_spark.functions.url import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.example", "/admin", False),
            ("a.example", "/admin/pub", True),
            ("a.example", "/tie", False),
            ("a.example", "/tie", True),  # equal length: allow wins
            ("b.example", "/", False),
        ],
        "host string, prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            ("https://a.example/admin/secret",),   # deny
            ("https://a.example/admin/pub/x",),    # re-allowed, longer
            ("https://a.example/open",),           # no matching rule
            ("https://a.example/tie",),            # tie -> allow
            ("https://b.example/anything",),       # deny-all host
            ("https://c.example/x",),              # host without rules
            ("https://b.example",),                # bare host -> path '/'
            ("HTTPS://a.example/admin/secret",),   # scheme case: same deny
            ("  https://b.example/x",),            # leading ws: same deny
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        "https://a.example/admin/secret": (False, "/admin"),
        "https://a.example/admin/pub/x": (True, "/admin/pub"),
        "https://a.example/open": (True, None),
        "https://a.example/tie": (True, "/tie"),
        "https://b.example/anything": (False, "/"),
        "https://c.example/x": (True, None),
        "https://b.example": (False, "/"),
        # host + path must share one grammar — a narrower path regex
        # fails OPEN on these (review finding)
        "HTTPS://a.example/admin/secret": (False, "/admin"),
        "  https://b.example/x": (False, "/"),
    }


def test_robots_filter_plan_broadcast_map_only(spark):
    """The verdict is a broadcast join + map-side array fold: no shuffle
    of the URL stream, no Python, no window."""
    from gnarly_spark.functions.url import robots_filter

    rules = spark.createDataFrame(
        [("a.example", "/x", False)], "host string, prefix string, allow boolean"
    )
    urls = spark.createDataFrame([("https://a.example/x",)], "url string")
    plan = (
        robots_filter(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HOSTS = ["a.example", "b.example"]
_PREFIXES = ["/", "/a", "/a/b", "/ab", "/b"]
_PATHS = ["", "/a", "/a/b/c", "/ab", "/abx", "/b", "/x"]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_robots_filter_matches_python_resolver(spark, data):
    """Property: verdicts equal a direct Python RFC 9309 resolver
    (longest matching prefix; duplicate-prefix tie -> allow; no match ->
    allowed) on arbitrary small rule/url sets."""
    from gnarly_spark.functions.url import robots_filter

    rules = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(_HOSTS),
                st.sampled_from(_PREFIXES),
                st.booleans(),
            ),
            min_size=0,
            max_size=8,
        )
    )
    urls = data.draw(
        st.lists(
            st.tuples(st.sampled_from(_HOSTS), st.sampled_from(_PATHS)),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )

    def resolve(host, path):
        path = path or "/"
        cand = [
            (len(p), a, p) for h, p, a in rules
            if h == host and path.startswith(p)
        ]
        if not cand:
            return True, None
        ln, a, p = max(cand)
        return bool(a), p

    want = {
        f"https://{h}{p}": resolve(h, p) for h, p in urls
    }
    rules_df = spark.createDataFrame(
        rules or [("zz.example", "/", True)],  # empty draw: unrelated host
        "host string, prefix string, allow boolean",
    )
    urls_df = spark.createDataFrame(
        [(f"https://{h}{p}",) for h, p in urls], "url string"
    )
    got = {
        r["url"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls_df, rules_df).collect()
    }
    assert got == want


def test_parse_robots_grouping_and_directives(spark):
    """RFC 9309 grouping: stacked User-agent headers share one group,
    comments strip, names are case-insensitive, empty path values drop,
    rules before any header belong to no group, non-* groups are skipped."""
    from gnarly_spark.functions.url import parse_robots

    body_a = "\n".join([
        "Disallow: /orphan",            # before any header: no group
        "# policy",
        "User-agent: googlebot",
        "Disallow: /g",
        "User-Agent: bingbot",          # stacked headers ...
        "user-agent: *",                # ... '*' joins this group
        "Disallow: /admin   # inline comment",
        "ALLOW: /admin/pub",
        "Disallow:",                    # empty value: ignored
        "",
        "User-agent: *",                # second '*' group
        "Disallow: /tmp",
    ])
    body_b = "User-agent: duckbot\nDisallow: /x"   # no '*' group at all
    files = spark.createDataFrame(
        [("a.example", body_a), ("b.example", body_b)],
        "host string, body string",
    )
    got = {
        (r["host"], r["prefix"], r["allow"])
        for r in parse_robots(files).collect()
    }
    assert got == {
        ("a.example", "/admin", False),
        ("a.example", "/admin/pub", True),
        ("a.example", "/tmp", False),
    }


def test_parse_robots_feeds_robots_filter(spark):
    """End-to-end compliance path: raw robots.txt -> parse -> gate."""
    from gnarly_spark.functions.url import parse_robots, robots_filter

    files = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /admin\nAllow: /admin/pub")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [("https://a.example/admin/x",), ("https://a.example/admin/pub/y",)],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, parse_robots(files)).collect()
    }
    assert got == {
        "https://a.example/admin/x": False,
        "https://a.example/admin/pub/y": True,
    }


SURT_CASES = [
    ("https://www.news.example.co.uk:8080/a/b?x=1",
     "uk,co,example,news:8080)/a/b?x=1"),
    ("HTTPS://Ex.COM/A#frag", "com,ex)/A"),
    ("http://ex.com:80/", "com,ex)/"),
    ("https://www.ex.com", "com,ex)/"),          # bare www host, default path
    ("https://ex.com/a?z=1&utm_source=t&a=2", "com,ex)/a?a=2&z=1"),
    ("https://localhost/x", "localhost)/x"),     # single label: no reorder
    ("https://www.uk/p", "uk)/p"),               # www + one label: dropped
    ("mailto:a@b.c", None),
    ("", None),
]


def test_surt_key_hand_computed(spark):
    from gnarly_spark.functions.url import surt_key

    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], "u string")
    got = dict(df.select("u", surt_key(F.col("u")).alias("s")).collect())
    for u, want in SURT_CASES:
        assert got[u] == want, u


def test_surt_key_sql_twin():
    from gnarly_spark.functions.url import canonicalize_url_sql, surt_key_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in SURT_CASES])
    rows = con.execute(
        f"WITH c AS (SELECT u, {canonicalize_url_sql('u')} AS canon FROM t) "
        f"SELECT u, {surt_key_sql('canon')} FROM c"
    ).fetchall()
    for u, got in rows:
        assert dict(SURT_CASES)[u] == got, u


def test_surt_clusters_registrable_domain(spark):
    """The property CDX range scans rely on: every page of a site sorts
    contiguously under its domain's SURT prefix."""
    from gnarly_spark.functions.url import surt_key

    df = spark.createDataFrame(
        [("https://a.shop.example.com/x",), ("https://www.shop.example.com/y",),
         ("https://other.example.com/z",)],
        "u string",
    )
    keys = sorted(r["s"] for r in df.select(surt_key(F.col("u")).alias("s")).collect())
    assert keys == [
        "com,example,other)/z",
        "com,example,shop)/y",
        "com,example,shop,a)/x",
    ]


def test_parse_robots_named_agent_star_fallback(spark):
    """RFC 9309: a named agent uses its own groups where present and falls
    back to the '*' group on hosts that never name it."""
    from gnarly_spark.functions.url import parse_robots

    files = spark.createDataFrame(
        [
            # names the agent: its group wins, '*' group ignored
            ("a.example",
             "User-agent: googlebot\nDisallow: /g\n\n"
             "User-agent: *\nDisallow: /star"),
            # never names it: '*' group applies
            ("b.example", "User-agent: *\nDisallow: /"),
            # names only others: '*' fallback still applies
            ("c.example",
             "User-agent: bingbot\nDisallow: /b\n\n"
             "User-agent: *\nDisallow: /c"),
        ],
        "host string, body string",
    )
    got = {
        (r["host"], r["prefix"], r["allow"])
        for r in parse_robots(files, agent="googlebot").collect()
    }
    assert got == {
        ("a.example", "/g", False),
        ("b.example", "/", False),
        ("c.example", "/c", False),
    }
