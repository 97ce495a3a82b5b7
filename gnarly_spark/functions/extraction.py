"""Deterministic html -> text extraction (the engine's ABI-decode analog).

The reference decodes raw EVM log payloads into typed events with a fixed,
golden-tested rule (reference: packages/gnarly-core/src/models/Log.ts:58-115,
golden constants test/models/Models.spec.ts:28-34). Our per-row transform is
html -> extracted text, and the contract is the same: **byte-identical output
per url, forever** (BASELINE.json input_hint). The rule is specified exactly
once, here, and every other component (fixtures oracle, streaming pipeline,
batch replay) imports it.

EXTRACTION RULE (normative, versioned):
  1. decode bytes as UTF-8 (errors="replace");
  2. drop <script>...</script> and <style>...</style> elements including
     their content (case-insensitive, non-greedy);
  3. drop HTML comments ``<!-- ... -->``;
  4. replace every remaining tag ``<...>`` with a single space;
  5. decode exactly these entities, in this order:
     &lt; &gt; &quot; &#39; &nbsp; (to ``< > " ' `` space) and &amp; LAST
     (so ``&amp;lt;`` decodes to ``&lt;`` — one level only, no re-scan);
  6. collapse every run of whitespace ([ \\t\\n\\r\\f\\v]+) to one space;
  7. strip leading/trailing spaces.

Executed vectorized over Arrow record batches via a pandas UDF — no
per-row Python in the Spark plan (input_hint: "no per-row Python").
pandas str ops run the regex chain over a whole Arrow batch at a time.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTION_RULE_VERSION = 1

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")

# (entity, replacement) — &amp; deliberately last; see rule 5.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text(html: bytes | None) -> str | None:
    """Reference implementation of the extraction rule for ONE document.

    This scalar form is the normative spec; `extract_text_udf` is the
    vectorized execution of the same rule (golden tests assert equality).
    """
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def _extract_series(html: pd.Series) -> pd.Series:
    """Vectorized rule over a pandas Series of bytes (one Arrow batch)."""
    # Series.str.decode is vectorized over the whole Arrow batch (None
    # passes through as NaN -> None); no per-element Python lambda
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, rep in _ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html)
