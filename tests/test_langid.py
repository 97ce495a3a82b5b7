"""Char-ngram language ID: model pin, held-out accuracy vs the stopword
baseline (the VERDICT r03 'done' criterion), edge cases, engine parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gnarly_spark.functions.langid import (
    LANGS,
    _norm_py,
    _score_norms,
    lang_id_ngram,
    load_model,
    model_path,
    oracle_sql_langid,
    train_model,
)

# held-out snippets — none of these sentences appear in SEED_TEXT
HELD_OUT = {
    "en": ["these are the words of an old story that we tell",
           "she opened the window and looked at the morning sky"],
    "de": ["dies ist eine geschichte über das leben in der stadt",
           "er öffnete das fenster und sah in den morgenhimmel"],
    "fr": ["ceci est une histoire sur la vie dans les montagnes",
           "elle a ouvert la fenêtre et regardé le ciel du matin"],
    "es": ["esta es una historia sobre la vida en las montañas",
           "ella abrió la ventana y miró el cielo de la mañana"],
    "it": ["questa è una storia sulla vita nelle montagne"],
    "pt": ["esta é uma história sobre a vida nas montanhas"],
    "nl": ["dit is een verhaal over het leven in de stad"],
    "sv": ["det här är en berättelse om livet i staden"],
    "pl": ["to jest opowieść o życiu w mieście"],
    "cs": ["toto je příběh o životě ve městě"],
    "ro": ["aceasta este o poveste despre viața în munți"],
    "fi": ["tämä on tarina elämästä kaupungissa"],
    "hu": ["ez egy történet az életről a városban"],
    "tr": ["bu şehirde yaşam hakkında bir hikaye"],
    "id": ["ini adalah cerita tentang kehidupan di kota"],
    "vi": ["đây là một câu chuyện về cuộc sống trong thành phố"],
    "ru": ["это история о жизни в большом городе"],
    "el": ["αυτή είναι μια ιστορία για τη ζωή στην πόλη"],
    "ar": ["هذه قصة عن الحياة في المدينة الكبيرة"],
    "he": ["זהו סיפור על החיים בעיר הגדולה"],
    "hi": ["यह शहर में जीवन के बारे में एक कहानी है"],
    "ja": ["これは町での生活についての物語です"],
    "zh": ["这是一个关于城市生活的故事"],
    "ko": ["이것은 도시에서의 삶에 관한 이야기입니다"],
}


def test_committed_model_matches_training():
    """The committed parquet IS train_model() of the embedded seeds —
    retraining is explicit and reviewable, never silent drift."""
    import pyarrow.parquet as pq

    t = pq.read_table(model_path())
    committed = set(
        zip(
            t.column("gram").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("lang_ord").to_pylist(),
            t.column("w").to_pylist(),
        )
    )
    assert committed == set(train_model())


def test_heldout_accuracy_beats_stopword_baseline():
    """The r03 'done' bar: ngram accuracy on held-out snippets beats the
    4-language stopword scorer. The baseline can at best get the en/de/
    fr/es rows; the ngram model must clear 90% over all 24 languages."""
    model = load_model()
    pairs = [(lang, s) for lang, ss in HELD_OUT.items() for s in ss]
    preds = _score_norms([_norm_py(s) for _, s in pairs], model)
    ngram_acc = sum(p == lang for (lang, _), p in zip(pairs, preds)) / len(pairs)
    baseline_ceiling = sum(
        1 for lang, _ in pairs if lang in ("en", "de", "fr", "es")
    ) / len(pairs)
    assert ngram_acc > baseline_ceiling
    assert ngram_acc >= 0.9, f"accuracy {ngram_acc}"


def test_stopword_baseline_actual_accuracy_is_lower(spark):
    """Run the REAL old scorer on the same snippets — not just its
    ceiling — and compare head-to-head."""
    from gnarly_spark.functions.text import lang_id

    pairs = [(lang, s) for lang, ss in HELD_OUT.items() for s in ss]
    df = spark.createDataFrame(pairs, "lang string, text string").select(
        "lang",
        lang_id(F.col("text")).alias("old"),
        lang_id_ngram(F.col("text")).alias("new"),
    )
    rows = df.collect()
    old_acc = sum(r.old == r.lang for r in rows) / len(rows)
    new_acc = sum(r.new == r.lang for r in rows) / len(rows)
    assert new_acc > old_acc


def test_und_and_edge_inputs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "12345 !!! ---"), (3, None), (4, "qqqq xxxx zzzz")],
        "doc_id long, text string",
    ).select("doc_id", lang_id_ngram(F.col("text")).alias("pred"))
    got = {r.doc_id: r.pred for r in df.collect()}
    assert got[1] == "und" and got[2] == "und" and got[3] == "und"
    assert got[4] in LANGS + ["und"]  # junk letters: deterministic, no crash


def test_spark_matches_duckdb_oracle_on_mixed_docs(spark, tmp_path):
    """Engine parity on adversarial inputs: mixed scripts, punctuation
    runs, uppercase, CJK without spaces — Spark (Java regex + Arrow UDF)
    and DuckDB (RE2 + SQL replay over the same parquet) must agree on
    every row."""
    docs = [
        (i, s)
        for i, s in enumerate(
            [s for ss in HELD_OUT.values() for s in ss]
            + [
                "The QUICK Brown FOX!!! und der faule Hund...",
                # Java SpecialCasing vs DuckDB simple casing: dotted İ
                # (i + combining dot vs plain i) and word-final Σ (ς vs
                # σ) — the case-fold pinning must make both engines agree
                "İSTANBUL VE İZMİR ŞEHİRLERİ ÇOK GÜZEL",
                "İyi günler İstanbul bu şehir çok büyük",
                "ΟΙ ΑΝΘΡΩΠΟΙ ΤΗΣ ΠΟΛΗΣ ΚΑΙ ΤΗΣ ΖΩΗΣ",
                "η σοφία της ζωής και το τέλος της ημέρας",
                "mixed 语言 text with 漢字 and latin words together",
                "números 123 and punctuation-only?!",
                "",
            ]
        )
    ]
    pdf_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(pdf_path)
    got = {
        r.doc_id: r.pred_lang
        for r in spark.read.parquet(pdf_path)
        .select("doc_id", lang_id_ngram(F.col("text")).alias("pred_lang"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pdf_path}/*.parquet')"
    )
    want = dict(con.execute(oracle_sql_langid()).fetchall())
    assert got == want


def test_session_jvm_locale_is_pinned(spark):
    """Gate-critical invariant (round 4): Java toLowerCase is locale-
    CONDITIONAL — a tr_TR-default JVM lowers ASCII 'I' to dotless 'ı',
    silently breaking every lower()-based expression whose DuckDB twin
    uses simple casing (langid normalization first among them).
    session.py pins -Duser.language=en on driver and executors; this
    test fails if a refactor ever drops the pin."""
    jvm = spark.sparkContext._jvm
    loc = jvm.java.util.Locale.getDefault().toString()
    assert loc.startswith("en"), f"JVM default locale {loc} — pin dropped?"
    (row,) = spark.sql("SELECT lower('ISTANBUL') AS a").collect()
    assert row.a == "istanbul"


def test_score_norms_vectorized_matches_scalar_reference(monkeypatch):
    """The r05 vectorized scorer (int64-packed trigrams + searchsorted +
    reduceat) must be bit-identical to the straightforward per-doc
    formulation on every edge: None, empty, sub-trigram, all-miss text,
    CJK isolation, and documents straddling the chunk boundary (forced
    tiny here)."""
    import numpy as np

    from gnarly_spark.functions import langid as L

    model = L.load_model()
    vocab, w, _, _ = L._matrix(model)
    langs = model[0]

    def scalar(t):
        if t is None:
            return "und"
        grams = L._grams(t)
        if not grams:
            return "und"
        ids = np.array([vocab.get(g, len(vocab)) for g in grams])
        if int((ids != len(vocab)).sum()) == 0:
            return "und"
        return langs[int(np.argmax(w[ids].sum(axis=0)))]

    raw = [
        None,
        "",
        "ab",
        "%%% 123 &&&",  # normalizes to near-empty
        "zzzzqqqqxxxx zzqq",  # likely all-miss
        "The quick brown fox jumps over the lazy dog",
        "El rápido zorro marrón salta sobre el perro perezoso",
        "Le renard brun rapide saute par-dessus le chien paresseux",
        "Der schnelle braune Fuchs springt über den faulen Hund",
        "这是一个中文测试句子用来验证语言识别",
        "これは日本語のテスト文です",
        "ISTANBUL İSTANBUL ΣΟΦΟΣ",  # case-fold pin chars
        "Съешь же ещё этих мягких французских булок",
    ]
    norms = [L._norm_py(t) if t is not None else None for t in raw]
    monkeypatch.setattr(L, "_SCORE_CHUNK_GRAMS", 8)  # force many chunks
    got = list(L._score_norms(norms, model))
    want = [scalar(t) for t in norms]
    assert got == want


def test_score_norms_property_random_unicode():
    """Property: vectorized == scalar on RANDOM unicode text (no Spark
    round trip — pure scorer, so a richer example budget is fine). Draws
    mix letters across the supported scripts, digits/punct (normalized
    away), astral-plane chars (the int64 packing must hold to 0x10FFFF),
    and empty/whitespace strings."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gnarly_spark.functions import langid as L

    model = L.load_model()
    vocab, w, _, _ = L._matrix(model)
    langs = model[0]

    def scalar(t):
        grams = L._grams(t)
        if not grams:
            return "und"
        ids = np.array([vocab.get(g, len(vocab)) for g in grams])
        if int((ids != len(vocab)).sum()) == 0:
            return "und"
        return langs[int(np.argmax(w[ids].sum(axis=0)))]

    text = st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
            st.characters(min_codepoint=0x370, max_codepoint=0x4FF),  # el/ru
            st.characters(min_codepoint=0x4E00, max_codepoint=0x4E7F),  # Han
            st.characters(min_codepoint=0x10000, max_codepoint=0x100FF),  # astral
        ),
        max_size=120,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(text, max_size=8))
    def check(raws):
        norms = [L._norm_py(t) for t in raws]
        got = list(L._score_norms(norms, model))
        assert got == [scalar(t) for t in norms]

    check()


def test_locale_guard_fails_loud_on_unpinned_cluster(spark):
    """ADVICE r04: builder confs don't reach spark-submit-owned JVMs, so
    get_spark now runtime-asserts the pin. The guard passes on the pinned
    session (executor probe included) and rejects a tr-locale driver."""
    from types import SimpleNamespace

    import pytest as _pytest

    from gnarly_spark.session import _assert_locale_pinned

    _assert_locale_pinned(spark, probe_executor=True)  # pinned: no raise

    fake = SimpleNamespace(
        sparkContext=SimpleNamespace(
            _jvm=SimpleNamespace(
                java=SimpleNamespace(
                    util=SimpleNamespace(
                        Locale=SimpleNamespace(
                            getDefault=lambda: SimpleNamespace(
                                getLanguage=lambda: "tr"
                            )
                        )
                    )
                )
            )
        )
    )
    with _pytest.raises(RuntimeError, match="user.language"):
        _assert_locale_pinned(fake, probe_executor=False)


def test_matrix_memo_tracks_model_identity(tmp_path):
    """ADVICE r04: the scoring-matrix memo was keyed by a constant, so a
    second load_model(custom_path) silently reused the first model's
    matrix. Now keyed by model identity: two loads of the same bytes at
    different paths get DISTINCT (equal) matrices."""
    import shutil

    import numpy as np

    from gnarly_spark.functions.langid import _matrix, load_model, model_path

    copy = tmp_path / "langid_copy.parquet"
    shutil.copyfile(model_path(), copy)
    m_default = load_model()
    m_copy = load_model(str(copy))
    assert m_default is not m_copy
    vocab_a, w_a, keys_a, rows_a = _matrix(m_default)
    vocab_b, w_b, keys_b, rows_b = _matrix(m_copy)
    assert w_a is not w_b  # per-model entries, no silent reuse
    assert vocab_a == vocab_b and np.array_equal(w_a, w_b)  # same bytes
    assert np.array_equal(keys_a, keys_b) and np.array_equal(rows_a, rows_b)
