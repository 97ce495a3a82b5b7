"""URL canonicalization for web-crawl dedup (reference analog: gnarly keys
every page row by its url string and treats distinct spellings as distinct
pages — packages/gnarly-core collapses nothing; a Common-Crawl-scale ingest
must, or every `?utm_source=` click-id mints a phantom page).

The rule set is deliberately small and FULLY SPECIFIED so a DuckDB oracle
reproduces it bit-for-bit (the same single-sourcing move as
operators/graph.py's link regexes):

1. Whitespace trimmed; everything from the first ``#`` (fragment) dropped.
2. A row is a URL iff it starts ``scheme://`` (``SCHEME_RE``); otherwise the
   canonical form is NULL (javascript:, mailto:, data:, relative paths).
3. Scheme and host are lowercased (ASCII — IDN punycode is out of scope and
   documented so; userinfo@ in the authority is likewise unsupported).
4. A default port is dropped (http:80, https:443); any other explicit port
   is kept as ``:port``.
5. An empty path becomes ``/``; trailing slashes are stripped, then an
   emptied path becomes ``/`` again (``/a/`` == ``/a``, but ``/`` == ``/``).
6. The query string is split on ``&``; empty params and tracking params
   (``TRACKING_RE``: utm_*, gclid, fbclid, msclkid — lowercase names, by
   name or name=value) are dropped; survivors are byte-sorted and rejoined.
   No surviving params -> no ``?``. Percent-decoding is deliberately NOT
   applied (decoding can change semantics; byte-sorting raw params is the
   conservative, idempotent choice).

Everything is JVM-side regexp/split/sort (codegen'd, no Python); the
``*_sql`` twins emit the equivalent DuckDB scalar expression for oracles —
the regex constants are shared, so the two dialects cannot drift.

Engine-parity notes: regexp_extract returns '' on no-match in BOTH engines;
every regexp_replace here is anchored, so DuckDB's replace-first and
Spark's replace-all agree; array_sort / list_sort are both binary-ascending
on ASCII; split('', '&') yields [''] in both and the empty-string filter
removes it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: a URL for our purposes = scheme '://' ... (group 1 = scheme)
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"

#: query params dropped before sorting (name alone or name=value)
TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)(=|$)"

#: scheme -> default port dropped from the authority
DEFAULT_PORTS = {"http": "80", "https": "443"}


def _parts(col: Column) -> dict[str, Column]:
    no_frag = F.regexp_extract(F.trim(col), r"^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(no_frag, SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, SCHEME_RE, "")
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(auth) + F.lit(1), F.length(rest))
    return {
        "scheme": scheme,
        "host": F.lower(F.regexp_extract(auth, r"^([^:]*)", 1)),
        "port": F.regexp_extract(auth, r":([0-9]+)$", 1),
        "rawpath": F.regexp_extract(pathq, r"^([^?]*)", 1),
        "query": F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1),
    }


def url_host(col: Column) -> Column:
    """Lowercased host (no port), NULL when the value is not a URL."""
    p = _parts(col)
    return F.when(p["scheme"] != "", p["host"])


def canonicalize_url(col: Column) -> Column:
    """Canonical spelling per the module rule set; NULL for non-URLs."""
    p = _parts(col)
    scheme, port = p["scheme"], p["port"]
    default_port = (
        (scheme == "https") & (port == DEFAULT_PORTS["https"])
    ) | ((scheme == "http") & (port == DEFAULT_PORTS["http"]))
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    # '' -> '/', strip trailing slashes, emptied -> '/' (rule 5)
    stripped = F.regexp_replace(
        F.when(p["rawpath"] == "", "/").otherwise(p["rawpath"]), r"/+$", ""
    )
    path = F.when(stripped == "", "/").otherwise(stripped)
    params = F.filter(
        F.split(p["query"], "&", -1),
        lambda x: (x != "") & (~x.rlike(TRACKING_RE)),
    )
    qjoin = F.array_join(F.array_sort(params), "&")
    return F.when(
        scheme != "",
        F.concat(
            scheme,
            F.lit("://"),
            p["host"],
            port_part,
            path,
            F.when(qjoin == "", "").otherwise(F.concat(F.lit("?"), qjoin)),
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB twins (oracle side) — same constants, same step structure
# ---------------------------------------------------------------------------


def _parts_sql(u: str) -> dict[str, str]:
    nf = f"regexp_extract(trim({u}), '^([^#]*)', 1)"
    scheme = f"lower(regexp_extract({nf}, '{SCHEME_RE}', 1))"
    rest = f"regexp_replace({nf}, '{SCHEME_RE}', '')"
    auth = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"substring({rest}, length({auth}) + 1)"
    return {
        "scheme": scheme,
        "host": f"lower(regexp_extract({auth}, '^([^:]*)', 1))",
        "port": f"regexp_extract({auth}, ':([0-9]+)$', 1)",
        "rawpath": f"regexp_extract({pathq}, '^([^?]*)', 1)",
        "query": f"regexp_extract({pathq}, '^[^?]*\\?(.*)$', 1)",
    }


def url_host_sql(u: str) -> str:
    p = _parts_sql(u)
    return f"CASE WHEN {p['scheme']} != '' THEN {p['host']} END"


def canonicalize_url_sql(u: str) -> str:
    p = _parts_sql(u)
    scheme, port = p["scheme"], p["port"]
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'https' AND {port} = "
        f"'{DEFAULT_PORTS['https']}') OR ({scheme} = 'http' AND {port} = "
        f"'{DEFAULT_PORTS['http']}') THEN '' ELSE ':' || {port} END"
    )
    nonempty = f"CASE WHEN {p['rawpath']} = '' THEN '/' ELSE {p['rawpath']} END"
    stripped = f"regexp_replace({nonempty}, '/+$', '')"
    path = f"CASE WHEN {stripped} = '' THEN '/' ELSE {stripped} END"
    # coalesce: DuckDB array_to_string([]) is NULL where Spark array_join
    # of an empty array is '' — without it every no-query URL canonicalizes
    # to NULL through the concat
    qjoin = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split("
        f"{p['query']}, '&'), x -> x != '' AND NOT regexp_matches(x, "
        f"'{TRACKING_RE}'))), '&'), '')"
    )
    return (
        f"CASE WHEN {scheme} != '' THEN {scheme} || '://' || {p['host']} || "
        f"{port_part} || {path} || "
        f"CASE WHEN {qjoin} = '' THEN '' ELSE '?' || {qjoin} END END"
    )


def canonicalize_url_dropquery(col: Column) -> Column:
    """The aggressive near-dup FINGERPRINT policy: like canonicalize_url
    but the whole query string is dropped (``?page=2`` == ``?page=3`` —
    right for "is this the same page content" grouping, wrong for a CDC
    merge key, where dropping params would alias distinct pages; pick per
    use). Legacy semantics pinned by the text_url_canonicalize oracle and
    kept distinct from the key-preserving default: only a SINGLE trailing
    slash is stripped, an empty path stays empty (no '/' is added), and a
    non-URL string passes through unchanged instead of becoming NULL.

    Pure JVM regexp chain (codegen'd, no Python).
    """
    prefix_re = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    raw_prefix = F.regexp_extract(col, prefix_re, 1)
    tail = col.substr(F.length(raw_prefix) + 1, F.length(col))
    u = F.concat(F.lower(raw_prefix), tail)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"\?.*$", "")
    u = F.regexp_replace(u, r"^(http://[^/:]*):80(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:]*):443(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"(.)/$", r"$1")
    return u


# ---------------------------------------------------------------------------
# Registrable domain (public-suffix grouping)
# ---------------------------------------------------------------------------

#: Curated SUBSET of the Public Suffix List (publicsuffix.org — public
#: data; the full list is ~10k rules and updated continuously, so embedding
#: it verbatim would rot: load the current file in production and pass it
#: via ``extra_2label``/``extra_3label``). Two groups, single-sourced into
#: both the Spark expression and the DuckDB oracle twin:
#: ICANN country second-level registries (grouping "x.co.uk" at "co.uk"
#: would merge every UK site into one "domain")...
PSL_2LABEL: tuple[str, ...] = (
    # UK / IE / commonwealth
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    # Japan / Korea / Taiwan / HK / SG / MY / ID / TH / VN / PH / IN
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "my.id", "sch.id",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "nic.in",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ve", "co.ve", "com.cl", "gob.cl", "com.ec", "com.uy", "com.py",
    "com.bo", "com.do", "com.gt", "com.sv", "com.ni", "com.pa", "com.cr",
    # Europe / MEA
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "gen.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "com.gh", "com.et", "com.tz", "co.tz", "co.ug", "com.bd", "net.bd",
    "org.bd", "edu.bd", "gov.bd", "com.pk", "net.pk", "org.pk", "edu.pk",
    "gov.pk", "com.np", "com.lk", "com.kh", "com.mm", "com.cn", "net.cn",
    "org.cn", "gov.cn", "edu.cn", "ac.cn", "com.ru",
    # ...and the private-section hosting suffixes a crawl actually hits
    # (user1.github.io and user2.github.io are DIFFERENT sites; grouping
    # them at github.io would let one platform eat a whole domain cap):
    "github.io", "gitlab.io", "bitbucket.io", "sourceforge.io",
    "blogspot.com", "wordpress.com", "tumblr.com", "weebly.com",
    "wixsite.com", "netlify.app", "vercel.app", "herokuapp.com",
    "appspot.com", "web.app", "firebaseapp.com", "pages.dev",
    "readthedocs.io", "neocities.org", "glitch.me", "repl.co",
    "fastly-edge.com", "azurewebsites.net", "cloudfront.net",
)

#: 3-label suffixes (same sourcing note)
PSL_3LABEL: tuple[str, ...] = (
    "s3.amazonaws.com", "s3-website.amazonaws.com", "pvt.k12.ma.us",
    "cdn.cloudflare.net", "r2.cloudflarestorage.com", "website.yandexcloud.net",
)

#: last-k-labels extractors, shared shape across both engines
#: (regexp_extract returns '' on no-match in both)
_LAST2_RE = r"([^.]+\.[^.]+)$"
_LAST3_RE = r"([^.]+\.[^.]+\.[^.]+)$"
_LAST4_RE = r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$"


def registrable_domain(
    host: Column,
    extra_2label: tuple[str, ...] = (),
    extra_3label: tuple[str, ...] = (),
) -> Column:
    """The registrable domain ("site") of a lowercased host — the eTLD+1
    grouping key that domain caps, per-site dedup budgets and host-graph
    collapse should key on (plain "last two labels" merges every .co.uk
    site into one; the reference has no notion of this at all, it keys raw
    url strings).

    Resolution (longest-match, like the PSL algorithm restricted to our
    embedded subset): if the last 3 labels are a known 3-label suffix the
    domain is the last 4 labels; else if the last 2 labels are a known
    2-label suffix, the last 3; else the last 2. A host that IS a public
    suffix, or a single label, has no registrable domain -> NULL.

    All JVM-side (regexp_extract + IN over a literal set -> codegen'd
    InSet); compose with url_host() for raw URLs. ``extra_*`` extend the
    embedded subset with e.g. the full downloaded PSL.
    """
    s2 = tuple(PSL_2LABEL) + tuple(extra_2label)
    s3 = tuple(PSL_3LABEL) + tuple(extra_3label)
    l2 = F.regexp_extract(host, _LAST2_RE, 1)
    l3 = F.regexp_extract(host, _LAST3_RE, 1)
    l4 = F.regexp_extract(host, _LAST4_RE, 1)
    return (
        F.when(host.isNull() | (l2 == ""), F.lit(None).cast("string"))
        .when(l3.isin(*s3), F.when(l4 != "", l4))
        .when(l2.isin(*s2), F.when(l3 != "", l3))
        .otherwise(l2)
    )


def registrable_domain_sql(
    h: str,
    extra_2label: tuple[str, ...] = (),
    extra_3label: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of registrable_domain, same constants (oracle side)."""
    s2 = ", ".join(
        "'" + s + "'" for s in tuple(PSL_2LABEL) + tuple(extra_2label)
    )
    s3 = ", ".join(
        "'" + s + "'" for s in tuple(PSL_3LABEL) + tuple(extra_3label)
    )
    l2 = f"regexp_extract({h}, '{_LAST2_RE}', 1)"
    l3 = f"regexp_extract({h}, '{_LAST3_RE}', 1)"
    l4 = f"regexp_extract({h}, '{_LAST4_RE}', 1)"
    return f"""CASE
        WHEN {h} IS NULL OR {l2} = '' THEN NULL
        WHEN {l3} IN ({s3}) THEN (CASE WHEN {l4} != '' THEN {l4} END)
        WHEN {l2} IN ({s2}) THEN (CASE WHEN {l3} != '' THEN {l3} END)
        ELSE {l2} END"""


# ---------------------------------------------------------------------------
# Robots-policy filter (longest-prefix-match allow/deny)
# ---------------------------------------------------------------------------


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-policy gate: annotate every URL with the robots.txt-style
    verdict of its host's rules — the compliance step a training-data
    pipeline runs before a page may enter the corpus (REP, RFC 9309:
    the LONGEST matching path prefix wins; on a length tie, allow wins;
    no matching rule means allowed).

    ``rules``: (host, prefix, allow boolean) — one row per directive,
    i.e. a parsed robots.txt corpus for the '*' agent.

    Scale shape: rules collapse to ONE array row per host (a tiny
    aggregation — real robots files average dozens of directives), which
    broadcast-joins onto the URL stream; the verdict is then pure map-side
    JVM: filter the host's rule array to prefix matches and take
    ``array_max`` over (prefix_length, allow) structs. ZERO corpus
    shuffles — 10^10 URLs are gated in a single scan, vs the join+window
    formulation that would shuffle the corpus twice (the DuckDB oracle
    uses that shape; same answer, wrong plan at scale).

    Output: input columns + (allowed boolean, matched_prefix string|null).
    """
    # host and path MUST come from the same URL grammar (_parts): a
    # hand-rolled path regex with a narrower scheme rule fails OPEN — the
    # host matches the rules row but the path misses, falls back to '/',
    # and a deny rule never fires (caught in review on 'HTTPS://...').
    p = _parts(F.col(url_col))
    host = F.when(p["scheme"] != "", p["host"])
    path = F.coalesce(F.nullif(p["rawpath"], F.lit("")), F.lit("/"))
    ra = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct("prefix", "allow")).alias("_rules")
    )
    j = (
        urls.withColumn("_host", host)
        .withColumn("_path", path)
        .join(F.broadcast(ra), F.col("_host") == F.col("_rhost"), "left")
    )
    best = F.array_max(
        F.expr(
            "transform(filter(_rules, r -> startswith(_path, r.prefix)),"
            " r -> struct(length(r.prefix) AS l, CAST(r.allow AS INT) AS a,"
            " r.prefix AS p))"
        )
    )
    return (
        j.withColumn("_best", best)
        .withColumn(
            "allowed",
            F.coalesce(F.col("_best.a") == 1, F.lit(True)),
        )
        .withColumn("matched_prefix", F.col("_best.p"))
        .drop("_host", "_path", "_rhost", "_rules", "_best")
    )


def parse_robots(
    files: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt bodies into the (host, prefix, allow) rules
    relation `robots_filter` consumes — the missing step between "crawled
    /robots.txt" and "gated the corpus". RFC 9309 grouping: consecutive
    User-agent lines form a group header; Allow/Disallow lines after
    apply to every agent named in that header; only groups naming
    ``agent`` (default '*') are kept. Comments (#...) strip, directive
    names are case-insensitive, an empty path value is ignored (an empty
    Disallow means "no restriction", not "deny nothing-prefix"), and
    rules before any User-agent header belong to no group.

    Scale shape: split + posexplode is map-only; the group assignment is
    ONE window over (host, line-pos) — a robots file is ~10^2 lines, so
    the per-host partition is tiny and 10^7 hosts parallelize on the
    host hash; the header/rule join is per-host too. No Python.
    """
    from pyspark.sql import Window

    lines = files.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "line"),
    )
    clean = F.trim(F.regexp_replace("line", "#.*$", ""))
    nm = F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    d = lines.select(
        "host", "pos", nm.alias("nm"), val.alias("val")
    ).where(F.col("nm").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    g = d.withColumn(
        "hdr",
        (
            (F.col("nm") == "user-agent")
            & (F.coalesce(F.lag("nm").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("hdr").over(w))
    # RFC 9309 group selection: groups naming ``agent`` (exact product
    # token, case-insensitive) win; a host with NO such group falls back
    # to its '*' groups — without the fallback a named crawler would
    # ignore a '*' Disallow entirely and fail OPEN (review finding).
    hdrs = g.where(F.col("nm") == "user-agent").groupBy("host", "grp").agg(
        F.max((F.lower(F.col("val")) == agent.lower()).cast("int")).alias(
            "_agent"
        ),
        F.max((F.col("val") == "*").cast("int")).alias("_star"),
    )
    named_hosts = (
        hdrs.where(F.col("_agent") == 1).select("host").distinct()
    )
    chosen = hdrs.join(named_hosts, "host", "left_semi").where(
        F.col("_agent") == 1
    )
    if agent != "*":
        fallback = hdrs.join(named_hosts, "host", "left_anti").where(
            F.col("_star") == 1
        )
        chosen = chosen.unionByName(fallback)
    return (
        g.where(F.col("nm").isin("allow", "disallow") & (F.col("val") != ""))
        .join(chosen.select("host", "grp"), ["host", "grp"])
        .select(
            "host",
            F.col("val").alias("prefix"),
            (F.col("nm") == "allow").alias("allow"),
        )
    )


# ---------------------------------------------------------------------------
# SURT keys (Sort-friendly URI Reordering Transform — the CDX index key)
# ---------------------------------------------------------------------------


def _surt_of_canonical(c: Column) -> Column:
    """SURT form of an ALREADY-canonical URL (see surt_key)."""
    rest = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.length(rest))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    labels = F.split(host, r"\.")
    nowww = F.when(
        (F.size(labels) > 1) & (F.element_at(labels, 1) == "www"),
        F.slice(labels, 2, F.size(labels) - 1),
    ).otherwise(labels)
    rev = F.array_join(F.reverse(nowww), ",")
    return F.when(c.isNotNull(), F.concat(rev, port, F.lit(")"), tail))


def surt_key(col: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the key format
    of Common Crawl's CDX index and the Internet Archive's Wayback):
    canonicalize (module rule set), drop a leading 'www' label, reverse
    the host labels comma-joined, then ``)`` + path[?sorted-query]:

        https://www.news.example.co.uk:8080/a/b?x=1
            -> uk,co,example,news:8080)/a/b?x=1

    Sorting by SURT clusters a registrable domain's pages contiguously —
    the property CDX range lookups and per-site exports rely on; it is
    also the join key for enriching a corpus from a CDX index. NULL for
    non-URLs, like canonicalize_url. All JVM (regexp/split/reverse).

    The DuckDB twin (`surt_key_sql`) takes an ALREADY-canonical column —
    compute `canonicalize_url_sql` in a prior CTE (nesting it per
    fragment would explode the expression)."""
    return _surt_of_canonical(canonicalize_url(col))


def surt_key_sql(canon: str) -> str:
    """DuckDB twin of `surt_key` over an already-canonical column."""
    rest = f"regexp_replace({canon}, '^[a-z][a-z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    tail = f"substring({rest}, length({hostport}) + 1)"
    host = f"regexp_extract({hostport}, '^([^:]*)', 1)"
    port = f"regexp_extract({hostport}, '(:[0-9]+)$', 1)"
    labels = f"string_split({host}, '.')"
    nowww = (
        f"CASE WHEN len({labels}) > 1 AND ({labels})[1] = 'www' "
        f"THEN ({labels})[2:] ELSE {labels} END"
    )
    rev = f"array_to_string(list_reverse({nowww}), ',')"
    return (
        f"CASE WHEN {canon} IS NOT NULL "
        f"THEN {rev} || {port} || ')' || {tail} END"
    )


def robots_sitemaps(
    files: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Extract ``Sitemap:`` declarations from raw robots.txt bodies —
    the discovery link between the robots fetch and the sitemap walk
    (robots_sitemaps -> parse_sitemap_index -> parse_sitemap ->
    recrawl_from_sitemap is the full publisher-signal chain a crawler
    runs). Per RFC 9309 / sitemaps.org the directive is group-independent
    (it applies regardless of User-agent sections), case-insensitive, and
    its value is an absolute URL; comments strip, lines without a colon
    are ignored. Output: (host, sitemap_url), de-duplicated per host.

    Scale shape: split + explode + regexp, all map-side JVM; the only
    shuffle is the final distinct on (host, url) — tiny (declarations,
    not pages)."""
    lines = files.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\r?\n")).alias("line"),
    )
    clean = F.trim(F.regexp_replace("line", "#.*$", ""))
    url = F.trim(F.regexp_extract(clean, r"(?i)^sitemap\s*:\s*(\S+)\s*$", 1))
    return (
        lines.select("host", url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
        .distinct()
    )


def robots_crawl_delay(
    files: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    default_delay: float = 1.0,
    max_delay: float = 60.0,
) -> DataFrame:
    """Per-host politeness budget from robots.txt ``Crawl-delay``
    (the de-facto extension every major crawler honors): seconds between
    fetches to one host. Case-insensitive, comments strip, non-numeric
    values ignored; multiple declarations take the MAX (the conservative
    read); absent -> ``default_delay``; capped at ``max_delay`` (a site
    declaring 86400 would otherwise exile itself from any schedule).
    Output: (host, delay_s double). Map-only + one tiny per-host max."""
    lines = files.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\r?\n")).alias("line"),
    )
    clean = F.trim(F.regexp_replace("line", "#.*$", ""))
    val = F.regexp_extract(clean, r"(?i)^crawl-delay\s*:\s*([0-9.]+)\s*$", 1)
    declared = (
        lines.select("host", val.alias("v"))
        .where(F.col("v") != "")
        # try_cast: the regex admits '1.2.3' / '.'; under Spark 4's
        # default ANSI mode a plain cast would THROW on the first wild
        # robots file instead of yielding the NULL the filter expects
        .select("host", F.expr("try_cast(v AS DOUBLE)").alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("host")
        .agg(F.least(F.max("v"), F.lit(float(max_delay))).alias("delay_s"))
    )
    hosts = files.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(declared, "host", "left").select(
        "host", F.coalesce("delay_s", F.lit(float(default_delay))).alias("delay_s")
    )


def schedule_fetches(
    due: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str | None = None,
    default_delay: float = 1.0,
) -> DataFrame:
    """Politeness-aware fetch slots for a due list (the crawl-frontier
    step after recrawl_from_sitemap/recrawl_schedule decide WHAT to
    fetch): within each host, order by ``priority_col`` (ascending NULLS
    LAST; ties by url for determinism) and assign ``slot_s = rank *
    delay_s`` — fetch k of a host waits k crawl-delays from window start.

    Scale shape: ONE shuffle on host (the window); the per-host delay
    relation is tiny and broadcast. A host with 10^6 due urls serializes
    BY DESIGN (that is what politeness means) — parallelism comes from
    the number of hosts, which is exactly how production frontiers
    (e.g. the Mercator/Heritrix queue-per-host design, public) shard.
    Output: ALL due columns carried through + delay_s + fetch_seq
    (1-based within host) + slot_s (seconds offset). Hosts missing from
    ``delays`` fall back to ``default_delay`` — pass the same value given
    to robots_crawl_delay or the politeness budget silently diverges."""
    from pyspark.sql import Window

    carry = [c for c in due.columns if c not in (url_col, host_col)]
    d = due.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        *[F.col(c) for c in carry],
    )
    order = (
        [F.col(priority_col).asc_nulls_last(), F.col("url").asc()]
        if priority_col
        else [F.col("url").asc()]
    )
    w = Window.partitionBy("host").orderBy(*order)
    j = d.join(F.broadcast(delays.select("host", "delay_s")), "host", "left")
    return (
        j.withColumn("fetch_seq", F.row_number().over(w))
        .withColumn("delay_s", F.coalesce("delay_s", F.lit(float(default_delay))))
        .withColumn(
            "slot_s", (F.col("fetch_seq") - 1).cast("double") * F.col("delay_s")
        )
        .select("url", "host", *carry, "delay_s", "fetch_seq", "slot_s")
    )
