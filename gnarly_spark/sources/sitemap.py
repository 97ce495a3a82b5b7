"""Sitemap parsing: the crawl-discovery boundary (sitemaps.org XML —
urlsets and sitemap indexes) as JVM-side Spark relations, feeding the
recrawl scheduler the *publisher's* change signal (``lastmod``) to join
against the engine's *observed* crawl state.

Why: the reference discovers work by tailing the chain head
(ingestion/Blockstream.ts:95-129); a web-scale CDC ingest additionally
gets push-style change hints from site operators — sitemap ``lastmod``
stamps — and a recrawl scheduler that ignores them wastes fetches on
unchanged pages and misses fresh ones. This module turns sitemap XML
payloads (they arrive through the same WARC/binary fetch path as any
page) into typed rows.

Scale shape — and why not an XML parser:

- a sitemap is machine-generated, schema-fixed XML (urlset/url/loc +
  three optional scalar children). The parse is ``split`` on ``</url>``
  + per-block ``regexp_extract`` — all JVM expressions under whole-stage
  codegen, embarrassingly parallel, no Python, no shuffle, no document
  ever assembled into a DOM (a 50k-entry sitemap never materializes as
  anything but a string column already in memory).
- per-BLOCK extraction (not document-level ``xpath`` array-zipping) is
  what makes missing optional tags safe: ``xpath('//loc')`` and
  ``xpath('//lastmod')`` return arrays that silently MISALIGN when one
  entry lacks a lastmod; a block either has the tag or yields NULL.
- entity unescape covers the five XML predefined entities — sitemap loc
  values are required to be entity-escaped (sitemaps.org protocol), and
  ``&amp;`` appears in any URL with a query string.

``lastmod`` accepts both W3C datetime forms the protocol allows: full
UTC datetime (``2026-01-05T10:00:00Z``) and date-only (``2026-01-05``,
parsed as midnight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-block extraction regexes — anchored on the tag pair, non-greedy,
#: whitespace-tolerant; RE2-compatible so a DuckDB twin can reuse them.
_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<]*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"<changefreq>\s*([^<]*?)\s*</changefreq>"
_PRIORITY_RE = r"<priority>\s*([^<]*?)\s*</priority>"
_SITEMAP_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"

#: the five XML predefined entities, decode order chosen so ``&amp;`` is
#: restored LAST (decoding it first would turn ``&amp;lt;`` into ``<``).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def xml_unescape(col: F.Column) -> F.Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def xml_escape(col: F.Column) -> F.Column:
    # encode order is the exact inverse: & first
    for ent, ch in reversed(_ENTITIES):
        col = F.replace(col, F.lit(ch), F.lit(ent))
    return col


def _parse_lastmod(raw: F.Column) -> F.Column:
    """W3C datetime -> timestamp_ntz: full UTC datetime or date-only
    (midnight). try_to_timestamp returns NULL on mismatch, so the coalesce
    cascade is total — a junk lastmod becomes NULL, never an error."""
    return F.coalesce(
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        # fractional seconds and minute precision are both legal in the
        # W3C datetime profile sitemaps.org references — common
        # generators emit millisecond lastmods, and a NULL here would
        # silently exempt those pages from 'stale' forever
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm'Z'")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")),
    ).cast("timestamp_ntz")


def parse_sitemap(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode a column of sitemap urlset documents into one row per
    ``<url>`` entry. Every other input column is carried through (so a
    (host, xml) relation yields (host, loc, ...) — the carry columns are
    how entries route back to their site).

    Output columns appended: ``loc`` (entity-decoded string), ``lastmod``
    (raw string or NULL), ``lastmod_ts`` (parsed timestamp_ntz or NULL),
    ``changefreq`` (string or NULL), ``priority`` (double or NULL).
    Entries without a ``<loc>`` are protocol violations and are dropped."""
    carry = [c for c in df.columns if c != xml_col]
    block = F.col("_block")
    loc = F.regexp_extract(block, _LOC_RE, 1)
    raw = {
        "lastmod": F.regexp_extract(block, _LASTMOD_RE, 1),
        "changefreq": F.regexp_extract(block, _CHANGEFREQ_RE, 1),
        "priority": F.regexp_extract(block, _PRIORITY_RE, 1),
    }
    # regexp_extract yields '' on no match — normalize to NULL once
    opt = {k: F.when(v != "", v) for k, v in raw.items()}
    return (
        df.select(*carry, F.explode(F.split(F.col(xml_col), "</url>")).alias("_block"))
        # only blocks that contain an entry open tag are candidate entries
        # (the tail after the last </url> holds </urlset>)
        .where(block.contains("<url>") & (loc != ""))
        .select(
            *carry,
            xml_unescape(loc).alias("loc"),
            opt["lastmod"].alias("lastmod"),
            _parse_lastmod(opt["lastmod"]).alias("lastmod_ts"),
            opt["changefreq"].alias("changefreq"),
            opt["priority"].alias("_prio_raw"),
        )
        # try_cast: wild sitemaps carry junk priorities; a plain cast
        # THROWS under default-ANSI Spark 4 — junk must become NULL,
        # never fail the batch (the module's stated contract)
        .withColumn("priority", F.expr("try_cast(_prio_raw AS DOUBLE)"))
        .drop("_prio_raw")
    )


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode a column of ``<sitemapindex>`` documents into one row per
    child sitemap: carry columns + ``loc`` + ``lastmod``/``lastmod_ts``.
    Feed the locs back through the fetch path, then parse_sitemap the
    payloads — the two-level discovery walk, flattened to two scans."""
    carry = [c for c in df.columns if c != xml_col]
    block = F.col("_block")
    loc = F.regexp_extract(block, _SITEMAP_LOC_RE, 1)
    lastmod = F.regexp_extract(block, _LASTMOD_RE, 1)
    opt_lastmod = F.when(lastmod != "", lastmod)
    return (
        df.select(
            *carry, F.explode(F.split(F.col(xml_col), "</sitemap>")).alias("_block")
        )
        .where(block.contains("<sitemap>") & (loc != ""))
        .select(
            *carry,
            xml_unescape(loc).alias("loc"),
            opt_lastmod.alias("lastmod"),
            _parse_lastmod(opt_lastmod).alias("lastmod_ts"),
        )
    )


def render_sitemap(
    entries: DataFrame,
    group_cols: list[str],
    loc_col: str = "loc",
    order_col: str | None = None,
    lastmod_col: str | None = "lastmod",
    changefreq_col: str | None = None,
    priority_col: str | None = None,
) -> DataFrame:
    """The writer half (export/fixture): one urlset XML document per
    group. Entry order inside a document is ``order_col`` (default: loc) —
    deterministic output, so round-trip tests and oracles can hash it.
    Optional columns render their tag only on non-null rows.

    Scale: one shuffle on the group key; the document assembles as an
    in-partition array_sort + array_join (no window, no second shuffle)."""
    order_col = order_col or loc_col

    def tag(name: str, col: F.Column) -> F.Column:
        return F.when(
            col.isNotNull(), F.concat(F.lit(f"<{name}>"), col, F.lit(f"</{name}>"))
        ).otherwise(F.lit(""))

    entry = F.concat(
        F.lit("<url>"),
        tag("loc", xml_escape(F.col(loc_col))),
        tag("lastmod", F.col(lastmod_col)) if lastmod_col else F.lit(""),
        tag("changefreq", F.col(changefreq_col)) if changefreq_col else F.lit(""),
        tag("priority", F.col(priority_col).cast("string")) if priority_col else F.lit(""),
        F.lit("</url>"),
    )
    assembled = (
        entries.select(
            *group_cols,
            F.struct(F.col(order_col).alias("o"), entry.alias("e")).alias("_oe"),
        )
        .groupBy(*group_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_oe")), lambda s: s.getField("e")
                ),
                "",
            ).alias("_body")
        )
    )
    return assembled.select(
        *group_cols,
        F.concat(
            F.lit(
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            ),
            F.col("_body"),
            F.lit("</urlset>"),
        ).alias("xml"),
    )


def recrawl_from_sitemap(
    sitemap_entries: DataFrame,
    crawl_state: DataFrame,
    url_col: str = "loc",
    crawl_url_col: str = "url",
    crawl_ts_col: str = "last_crawl_ts",
) -> DataFrame:
    """Join the publisher's change signal against observed crawl state:
    which sitemap URLs need a (re)fetch?

    - ``new``   — in the sitemap, never crawled
    - ``stale`` — ``lastmod_ts`` is after the last crawl
    URLs whose lastmod is absent or not newer are not emitted (recrawl
    cadence for those stays with the observed-change scheduler,
    cdc_recrawl_schedule).

    Scale: at 10^10 crawled pages the crawl-state relation is the big
    side, and a plain left join from the sitemap side CANNOT broadcast
    (Spark builds only the non-preserved side of an outer join — the
    big one here), so it would shuffle the whole crawl state. Instead,
    the big relation is probed with one broadcast-INNER join (sitemap
    side is the build side, crawl state streams through map-side, ZERO
    shuffles) whose tiny output — the sitemap urls that WERE crawled —
    then left-joins the sitemap relation broadcast-to-broadcast."""
    sm = sitemap_entries.select(
        F.col(url_col).alias("_u"), F.col("lastmod"), F.col("lastmod_ts")
    )
    cs = crawl_state.select(
        F.col(crawl_url_col).alias("_u"), F.col(crawl_ts_col).alias("_crawled")
    )
    # one streaming pass over the big relation; output is sitemap-sized
    seen = cs.join(F.broadcast(sm.select("_u")), "_u", "inner")
    j = sm.join(F.broadcast(seen), "_u", "left")
    status = F.when(F.col("_crawled").isNull(), "new").when(
        F.col("lastmod_ts") > F.col("_crawled"), "stale"
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(F.col("_u").alias("url"), "status", "lastmod")
    )
