"""Golden tests for the extraction rule (analog of the reference's ABI
decode golden tests, test/models/Models.spec.ts:28-34 and
test/utils.spec.ts:103-111)."""

from __future__ import annotations

import pandas as pd

from gnarly_spark.functions.extraction import _extract_series, extract_text
from gnarly_spark.fixtures import html_for

GOLDEN = [
    (b"<html><body><p>Hello <b>world</b></p></body></html>", "Hello world"),
    (b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f</p>", "a & b <c> \"d\" 'e' f"),
    # one-level entity decode only: &amp;lt; -> &lt;
    (b"<p>&amp;lt;</p>", "&lt;"),
    (b"<script>var x = '<p>no</p>';</script><p>yes</p>", "yes"),
    (b"<style>p{}</style><p>ok</p>", "ok"),
    (b"<!-- secret --><p>visible</p>", "visible"),
    (b"  \n\t multi   space \r\n", "multi space"),
    (b"", ""),
    (None, None),
    # invalid utf-8 -> U+FFFD replacement, deterministic
    (b"<p>\xff\xfe ok</p>", "�� ok"),
]


def test_golden_scalar():
    for html, want in GOLDEN:
        assert extract_text(html) == want, html


def test_vectorized_matches_scalar():
    s = pd.Series([g[0] for g in GOLDEN], dtype=object)
    got = _extract_series(s)
    for i, (_, want) in enumerate(GOLDEN):
        assert got.iloc[i] == want or (want is None and got.iloc[i] is None)


def test_fixture_html_roundtrip_deterministic():
    h1 = html_for("https://a.example/1", 7)
    h2 = html_for("https://a.example/1", 7)
    assert h1 == h2
    t = extract_text(h1)
    assert "para" in t and "<raw>" in t and "& more" in t
    assert "<p>" not in t and "var v=" not in t and "crawl" not in t


def test_udf_on_spark(spark):
    from pyspark.sql import functions as F

    from gnarly_spark.functions.extraction import extract_text_udf

    pdf = pd.DataFrame({"html": [g[0] for g in GOLDEN]})
    df = spark.createDataFrame(pdf, schema="html binary")
    got = [r.text for r in df.select(extract_text_udf("html").alias("text")).collect()]
    assert got == [g[1] for g in GOLDEN]


def test_golden_corpus_byte_identical(spark):
    """Frozen corpus: html + extracted text hashes for 60 (url, version)
    cases. Any change to the extraction rule or to the html generator is a
    contract break (the per-url byte-identical invariant of
    BASELINE.json input_hint). Vectorized UDF must reproduce the same
    bytes as the scalar spec."""
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from gnarly_spark.functions.extraction import extract_text_udf

    with open(os.path.join(os.path.dirname(__file__), "golden_extraction.json")) as f:
        golden = json.load(f)
    assert golden["rule_version"] == 1
    cases = golden["cases"]
    for c in cases:
        html = html_for(c["url"], c["op_seq"])
        assert hashlib.sha256(html).hexdigest() == c["html_sha256"], c["url"]
        text = extract_text(html)
        assert hashlib.sha256(text.encode()).hexdigest() == c["text_sha256"], c["url"]
    # vectorized path over all cases at once
    pdf = pd.DataFrame({"html": [html_for(c["url"], c["op_seq"]) for c in cases]})
    df = spark.createDataFrame(pdf, schema="html binary")
    got = [r.text for r in df.select(extract_text_udf("html").alias("text")).collect()]
    for text, c in zip(got, cases):
        assert hashlib.sha256(text.encode()).hexdigest() == c["text_sha256"]
