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
