"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side column expressions (regexp/md5/size/split — codegen'd, no
Python). Heuristics are deliberately simple & fully specified so a SQL
oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnarly_spark.operators.dedup import normalize_text

# marker stopwords per language (tiny, deterministic heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "una"],
}

# a BPE-ish token regex: runs of word chars OR single non-space symbols
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def _count_word(col, word: str):
    """Occurrences of a whole word (\\b boundaries; non-overlapping count is
    identical in Java regex and RE2, so the oracle agrees)."""
    return F.size(
        F.regexp_extract_all(normalize_text(col), F.lit(rf"\b{word}\b"), 0)
    ).cast("long")


def _count_words(col, words: list[str]):
    """Total occurrences of any of ``words`` via ONE alternation regex.
    Value-identical to summing per-word counts: with \\b guards around
    DISTINCT words, at most one alternative can match at a position (a
    shorter prefix word matching implies a non-word char next, which
    kills every longer alternative), so the non-overlapping scan counts
    exactly the union — in Java regex and RE2 alike. One text scan
    instead of len(words): lang_id over 4x4 markers was 16 scans per row
    before, and the curation bench showed it dominating the whole pass."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(
        F.regexp_extract_all(normalize_text(col), F.lit(pat), 0)
    ).cast("long")


def lang_scores(col):
    return {lang: _count_words(col, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col):
    """argmax over marker-word counts; ties break en > de > fr > es
    (dict order); all-zero scores -> 'und' (undetermined).

    Shape: scores land in ONE array; argmax = array_position(arr,
    array_max(arr)) — first index wins ties, preserving the dict-order
    rule. A greatest() + when()-chain re-references every score per
    branch and re-evaluates the regexes ~6x (the unresolved-tree
    duplication gotcha); this form scans the text twice total."""
    scores = lang_scores(col)
    arr = F.array(*scores.values())
    best = F.array_max(arr)
    return F.when(
        best > 0,
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANG_MARKERS]),
            F.array_position(arr, best).cast("int"),
        ),
    ).otherwise(F.lit("und"))


def token_count(col):
    """Whitespace token count."""
    t = normalize_text(col)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, " "))).cast("long")


def bpe_ish_token_count(col):
    """Sub-word-ish token count via TOKEN_REGEX."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0)).cast("long")


# ---------------------------------------------------------------------------
# Real BPE token counting: a ranked merge table (trained on the corpus or
# loaded from a public merges.txt) applied greedily inside an Arrow-batched
# pandas UDF. Token budgets in training pipelines are tokenizer tokens, not
# whitespace words — pack_sequences budgets on this when merges are given.
# ---------------------------------------------------------------------------

# Token-boundary marker for the merge-application representation: each
# token is MARK + token + ' ', so the pattern 'MARK a MARK b ' matches a
# (a, b) token pair exactly (never a token suffix/prefix), and one
# left-to-right non-overlapping str.replace pass per merge IS the BPE merge
# step. Applying merges in rank order, one pass each, equals priority-queue
# BPE for any properly-ranked merge list (each merge's parts are created by
# strictly earlier merges, and later merges can only fuse neighbors —
# never re-create a lower-ranked pair).
_BPE_MARK = "\x01"


def _bpe_word_tokens(word: str, patterns: list[tuple[str, str]]) -> int:
    rep = "".join(f"{_BPE_MARK}{c} " for c in word)
    for pat, sub in patterns:
        if pat in rep:
            rep = rep.replace(pat, sub)
    return rep.count(_BPE_MARK)


def _bpe_patterns(merges) -> list[tuple[str, str]]:
    return [
        (f"{_BPE_MARK}{a} {_BPE_MARK}{b} ", f"{_BPE_MARK}{a}{b} ")
        for a, b in merges
    ]


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tok) — real BPE token counts: normalize JVM-side, then apply
    the ranked ``merges`` greedily per word inside ONE vectorized pandas
    UDF. The merge table rides a SparkContext broadcast (one transfer per
    executor, fine up to GPT-2's 50k merges); per-word counts are memoized
    per Python worker, which on natural text (Zipfian words) makes the
    amortized cost ~a dict hit per word."""
    return docs.select(
        F.col(id_col).alias("id"),
        bpe_count_column(docs.sparkSession, merges, F.col(text_col)).alias(
            "n_tok"
        ),
    )


def bpe_count_column(spark, merges, text_col) -> "F.Column":
    """The BPE-count Column itself (normalize JVM-side -> one pandas UDF)
    so callers (bpe_token_count, pack_sequences) add it without a join."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(list(merges))
    memo: dict[str, int] = {}
    _pat: list = []  # per-worker: the pattern table is built ONCE, not per
    # Arrow batch (50k string formats per batch adds up on small batches)

    @pandas_udf("long")
    def n_tok(texts):
        if not _pat:
            _pat.append(_bpe_patterns(bc.value))
        patterns = _pat[0]

        def count_doc(t: str | None) -> int:
            if not t:
                return 0
            total = 0
            for w in t.split(" "):
                n = memo.get(w)
                if n is None:
                    n = _bpe_word_tokens(w, patterns)
                    memo[w] = n
                total += n
            return total

        return texts.map(count_doc)

    return n_tok(normalize_text(text_col))


def _bpe_word_pieces(word: str, patterns: list[tuple[str, str]]) -> tuple[str, ...]:
    rep = "".join(f"{_BPE_MARK}{c} " for c in word)
    for pat, sub in patterns:
        if pat in rep:
            rep = rep.replace(pat, sub)
    return tuple(t[1:] for t in rep.split(" ") if t)


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, token) — the actual BPE token STREAM (not just counts):
    one row per sub-word token, pos 1-based over the whole document. Same
    merge semantics, broadcast and memoization as bpe_token_count; the
    UDF returns the token array, posexplode flattens it JVM-side (scalar
    rows — engine-portable for the oracle, no array-representation
    hashing hazards)."""
    from pyspark.sql.functions import pandas_udf

    bc = docs.sparkSession.sparkContext.broadcast(list(merges))
    memo: dict[str, tuple[str, ...]] = {}
    _pat: list = []  # built once per worker (see bpe_count_column)

    @pandas_udf("array<string>")
    def toks(texts):
        if not _pat:
            _pat.append(_bpe_patterns(bc.value))
        patterns = _pat[0]

        def tokenize(t: str | None) -> list[str]:
            if not t:
                return []
            out: list[str] = []
            for w in t.split(" "):
                pieces = memo.get(w)
                if pieces is None:
                    pieces = _bpe_word_pieces(w, patterns)
                    memo[w] = pieces
                out.extend(pieces)
            return out

        return texts.map(tokenize)

    return docs.select(
        F.col(id_col).alias("id"),
        toks(normalize_text(F.col(text_col))).alias("_toks"),
    ).select(
        "id",
        F.posexplode("_toks").alias("pos0", "token"),
    ).select("id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


def bpe_tokenize_sql(merges: list[tuple[str, str]], text_sql: str = "text") -> str:
    """DuckDB twin of bpe_tokenize (FROM documents), single-sourced from
    the same merge table: per word, marker representation -> chained
    replace() -> split back to tokens; parallel unnests zip (pos, token)."""
    norm = rf"trim(regexp_replace(lower({text_sql}), '\s+', ' ', 'g'))"
    rep = r"regexp_replace(w, '(.)', chr(1) || '\1' || ' ', 'g')"
    for a, b in merges:
        pat = f"chr(1) || {_sql_quote(a + ' ')} || chr(1) || {_sql_quote(b + ' ')}"
        sub = f"chr(1) || {_sql_quote(a + b + ' ')}"
        rep = f"replace({rep}, {pat}, {sub})"
    word_toks = (
        f"[replace(t, chr(1), '') for t in string_split(trim({rep}), ' ') if t <> '']"
    )
    return f"""
    WITH d AS (SELECT doc_id AS id,
                      flatten([{word_toks}
                               for w in string_split({norm}, ' ')]) AS toks
               FROM documents)
    SELECT id AS doc_id, unnest(range(1, len(toks) + 1)) AS pos,
           unnest(toks) AS token
    FROM d
    """


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 64,
    max_vocab: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train a ranked BPE merge list on the corpus itself (classic
    Sennrich et al. 2016 training over a word-frequency table).

    Scale shape: the corpus contributes ONE distributed word-count pass
    (explode -> groupBy, partial-aggregated); training then runs on the
    top ``max_vocab`` (word, count) rows driver-side — a BOUNDED relation
    (50k rows covers the mass of any Zipfian corpus), which is how real
    BPE trainers work too. Ties break on lexicographically smallest pair
    so the merge list is deterministic across runs and partitionings."""
    wc = (
        docs.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r["w"]): int(r["count"]) for r in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_count_sql(merges: list[tuple[str, str]], text_sql: str = "text") -> str:
    """DuckDB twin of bpe_token_count, single-sourced from the SAME merge
    table: per word, build the marker representation with regexp_replace,
    apply each merge as one replace() (identical non-overlapping
    left-to-right semantics), count markers. CAST to BIGINT — list_sum
    returns HUGEINT (the w_sessionize lesson)."""
    norm = rf"trim(regexp_replace(lower({text_sql}), '\s+', ' ', 'g'))"
    rep = r"regexp_replace(w, '(.)', chr(1) || '\1' || ' ', 'g')"
    for a, b in merges:
        pat = f"chr(1) || {_sql_quote(a + ' ')} || chr(1) || {_sql_quote(b + ' ')}"
        sub = f"chr(1) || {_sql_quote(a + b + ' ')}"
        rep = f"replace({rep}, {pat}, {sub})"
    per_word = f"length({rep}) - length(replace({rep}, chr(1), ''))"
    return (
        f"CAST(coalesce(list_sum([{per_word} "
        f"for w in string_split({norm}, ' ')]), 0) AS BIGINT)"
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score.

    score = 0.5*stopword_ratio + 0.3*alpha_ratio + 0.2*min(n_tokens,100)/100
    (rounded to 6 dp for oracle comparison).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    stop = lang_scores(t)["en"]
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_chars = F.length(t)
    stop_ratio = F.round(stop / F.greatest(n_tok, F.lit(1)), 6)
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    score = F.round(
        0.5 * stop / F.greatest(n_tok, F.lit(1))
        + 0.3 * n_alpha / F.greatest(n_chars, F.lit(1))
        + 0.2 * F.least(n_tok, F.lit(100)) / 100,
        6,
    )
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(col):
    """Document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def scrub_pii(col):
    """Training-data PII scrubbing pass: mask emails, then long digit runs
    (phone/account numbers) — the standard pre-training hygiene transform.
    Rule (order matters, fully specified for the oracle):
      1. email-like tokens -> '<EMAIL>';
      2. runs of >= 7 DIGITS, each adjacent pair optionally separated by
         ONE of [. - space] -> '<NUMBER>'. Counting digits (not chars)
         keeps 6-digit values (dates '202408', postal codes, short ids)
         intact, and the single-separator bound stops the match from
         swallowing prose around spaced-out numbers.
    """
    s = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    return F.regexp_replace(s, r"\d(?:[ .-]?\d){6,}", "<NUMBER>")


def collapse_repeat_tokens(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse runs of consecutively repeated tokens ("again again again"
    -> "again") — the cheap within-doc repetition cleanup a webtext corpus
    runs before tokenization.

    Pure JVM array expressions over a staged word array (the split lives in
    its own projection so the higher-order filter references an attribute,
    not a re-evaluated split — the CollapseProject O(n^2) trap). No shuffle:
    a map-only pass, whole-stage codegen. Output:
    (doc_id, clean_text, n_removed).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    w = F.col("_w")
    # keep token i (0-based) iff it differs from its predecessor; the CASE
    # guards element_at(w, 0) which ANSI mode rejects
    kept = F.filter(
        w,
        lambda x, i: F.when(i == F.lit(0), F.lit(True)).otherwise(
            x != F.element_at(w, i)
        ),
    )
    return base.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(w) - F.size(kept)).cast("long").alias("n_removed"),
    )


def sentence_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode documents into position-indexed sentence lines:
    (id, pos, sent, skey) where skey is the normalized match key. The unit
    of C4-style line-level dedup (one Generate, all JVM)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\. ")).alias("pos", "sent"),
    ).withColumn("skey", F.trim(F.lower(F.col("sent"))))


def line_dedup_stats(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate lines: sentences appearing in >= min_docs
    distinct docs — the boilerplate census (nav bars, cookie banners,
    license blurbs dominate web corpora). One explode + one groupBy on
    the line hash; partial aggregation pre-reduces hot lines map-side, so
    a line occurring in 10^8 pages costs one row per input partition on
    the wire, not 10^8."""
    s = sentence_lines(docs, text_col, id_col)
    return (
        s.groupBy(F.md5("skey").alias("line_hash"))
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_total"),
            F.min("id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def scrub_boilerplate(
    docs: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove lines that occur in >= min_docs distinct documents and
    reassemble each doc's remaining lines in order (C4's line-level
    cleanup). Output: (doc_id, clean_text, n_removed) for EVERY input doc
    (a fully-boilerplate doc keeps an empty clean_text).

    Scale shape: the boilerplate line set is SMALL (by definition it is
    the high-doc-frequency tail) -> broadcast anti-join against the
    exploded lines; reassembly is one groupBy(id) with an order-restoring
    sort over each doc's own lines only. No shuffle carries full document
    texts except the final per-doc reassembly."""
    s = sentence_lines(docs, text_col, id_col)
    hot = (
        s.groupBy("skey")
        .agg(F.countDistinct("id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("skey")
    )
    kept = s.join(F.broadcast(hot), "skey", "left_anti")
    clean = kept.groupBy("id").agg(
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                lambda x: x.sent,
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), r"\. ")).cast("long").alias("n_lines"),
    )
    return base.join(clean, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


def lm_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-unigram-LM quality score per doc: average token surprisal
    -ln p(w) under the corpus's OWN unigram distribution (the shape of
    CCNet's LM quality filter, with the corpus itself standing in for the
    external model). Low = templated/common wording, high = rare/garbled —
    either tail is a filter candidate.

    Scale shape: ONE scan of the text. The exploded tokens collapse
    immediately to per-doc word counts (id, w, n) — smaller than the raw
    token relation by the repetition factor — and that checkpointed
    relation feeds both the vocab aggregate and the score join (two lazy
    branches over the raw explode would scan + regex-normalize every
    document twice; a partial-agg exchange can't be ReuseExchange'd against
    a plain one). Vocab is O(distinct words), tiny next to the counts, so
    AQE broadcasts the join; the token total rides a 1-row broadcast
    crossJoin, never a driver collect. avg surprisal = sum(n·-ln p)/sum(n),
    weighted by the collapsed counts.
    """
    from gnarly_spark.operators.dedup import _spread

    toks = (
        _spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(
            "id", F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
        )
        # split('') yields [''] — the empty pseudo-token must not enter the
        # vocab or score empty docs
        .where(F.col("w") != "")
    )
    tw = toks.groupBy("id", "w").agg(F.count("*").alias("n")).localCheckpoint()
    vocab = tw.groupBy("w").agg(F.sum("n").cast("double").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    scored = (
        tw.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.col("n") * -F.log(F.col("c") / F.col("t"))) / F.sum("n"), 6
            ).alias("lm_score"),
            F.sum("n").alias("n_tokens"),
        )
    )
    # every input doc gets a row (NULL/empty text -> NULL score, 0 tokens) —
    # same contract as unigram_surprisal/gopher_repetition; an inner shape
    # would silently drop null-text pages from any pipeline joining on it
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "lm_score",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    chunk_rows: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Greedy first-fit sequence packing for training: docs fill
    fixed-token-budget packs by cumulative token count — whitespace
    tokens by default, REAL BPE tokens when a ranked ``merges`` table is
    passed (train_bpe_merges / a public merges.txt), which is what makes
    the budget trustworthy for an actual tokenizer.
    Output: (id, n_tok, pack_id).

    Deterministic AND distributed: the cumsum window is partitioned by
    (source, id div chunk_rows) — packs never cross a chunk boundary, so
    at corpus scale no single window task sees more than one chunk (the
    slight fill loss at chunk edges is the price of parallelism; a global
    ORDER BY would serialize the corpus through one task).

    The single source of the packing rule — text_pack_sequences and the
    composed pipeline_training_corpus both call this, so the rule cannot
    silently diverge between the oracle-checked operator and the pipeline.
    """
    from pyspark.sql import Window

    from pyspark.sql.types import NumericType

    if not isinstance(docs.schema[id_col].dataType, NumericType):
        raise TypeError(
            f"pack_sequences chunks on `{id_col} div {chunk_rows}`, which "
            f"needs a numeric id; pass a numeric surrogate (e.g. "
            f"xxhash64({id_col})) for string keys like urls"
        )
    if merges is not None:
        n_tok = bpe_count_column(docs.sparkSession, merges, F.col(text_col))
    else:
        # token_count's ''-guard: an empty/whitespace-only doc is 0 tokens,
        # not the 1 that size(split('', ' ')) == size(['']) reports
        n_tok = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    d = docs.select(
        F.col(id_col),
        F.col(source_col),
        n_tok.alias("n_tok"),
        F.expr(f"{id_col} div {chunk_rows}").alias("chunk"),
    )
    w = (
        Window.partitionBy(source_col, "chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    return d.select(
        id_col,
        "n_tok",
        F.concat_ws(
            "/",
            source_col,
            F.col("chunk").cast("string"),
            F.floor(start / budget).cast("string"),
        ).alias("pack_id"),
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-text inverted index: one row per distinct token with its
    document frequency and sorted posting list (comma-joined doc ids —
    a flat representation so the oracle hash is layout-independent).

    Shape: explode → distinct (id, token) → ONE groupBy(token) — partial
    aggregation collapses per-partition postings before the shuffle. The
    per-token posting list is the scale hazard (a stopword's list is
    O(corpus)); the band is the guard: ``max_df`` caps hot tokens out of
    the index (they become query-time stopwords, the Lucene move) and
    ``min_df`` drops hapax noise. sort_array makes the list deterministic
    regardless of shuffle arrival order.
    """
    from gnarly_spark.operators.dedup import _spread

    toks = (
        _spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(
            "id",
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
        )
        # empty-text docs must not mint a '' token row (the MV census twin
        # in operators/mv.py filters it too — keep them reconcilable)
        .where(F.col("token") != "")
        .distinct()
    )
    idx = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col("id").cast("string")))
        ).alias("postings"),
    )
    if min_df > 1:
        idx = idx.where(F.col("doc_freq") >= min_df)
    if max_df is not None:
        idx = idx.where(F.col("doc_freq") <= max_df)
    return idx


def tfidf_search(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF retrieval: every document matching at least one query term,
    scored sum_t tf(t,d) · ln(N / df(t)). Returns (doc_id, score,
    n_terms) — no top-k cutoff here, so near-tie ULP noise between
    engines can't flip which rows appear; callers add their own limit.

    Shape: the exploded token relation is filtered to the |terms| tokens
    BEFORE any shuffle (the isin predicate sits on the generate output),
    so the aggregate carries O(matching tokens), never the corpus; df
    and the corpus size N ride tiny broadcast relations. Score is
    rounded to 6 decimals for engine-portable comparison (same recipe
    as lm_quality).
    """
    from gnarly_spark.operators.dedup import _spread

    toks = (
        _spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(
            "id",
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
        )
        .where(F.col("w").isin(list(terms)))
    )
    # tw is tiny after the isin filter but its SUBTREE is the full corpus
    # scan + regex + explode; it feeds both join branches (scores and df)
    # and Spark has no cross-branch subtree CSE — checkpoint it so the
    # corpus is scanned once, not twice (same move as lm_quality). N is a
    # separate zero-column count scan (footer-cheap), unavoidable: docs
    # matching no term must still count toward it.
    tw = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    dfreq = tw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        tw.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(n))
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.col("n") / F.col("df"))), 6
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .select(F.col("id").alias(id_col), "score", "n_terms")
    )


def gopher_repetition(
    docs: DataFrame,
    ns: tuple[int, ...] = (2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-doc n-gram repetition signals (Gopher / MassiveText quality
    rules, Rae et al. 2021 table A1): per doc and per n,

      dup{n}  — fraction of n-gram OCCURRENCES that are repeats of an
                earlier occurrence (1 - distinct/total);
      top{n}  — fraction held by the single most frequent n-gram.

    Docs keep-filter thresholds (e.g. drop if dup2 > 0.2) are the standard
    crawl-cleaning gate for machine-generated / template spam that plain
    dedup can't see (the repetition is INSIDE one document).

    Scale shape: one explode per n over the doc's own words, then ONE
    partial-aggregating groupBy(id, gram) + groupBy(id) per n — per-doc
    work is bounded by doc length, cross-doc nothing joins. All-integer
    counts; ratios are single divisions rounded 6dp (oracle-exact).
    Short docs (< n words) have no n-grams: both signals are 0 by
    definition (left join + coalesce).
    """
    from gnarly_spark.operators.dedup import normalize_text

    base = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    out = docs.select(F.col(id_col))
    for n in ns:
        w = F.col("_w")
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
        ).otherwise(F.array().cast("array<int>"))
        grams = base.select(
            "id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(w, i + j + 1) for j in range(n)]
                    ),
                )
            ).alias("g"),
        )
        per = (
            grams.groupBy("id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("id")
            .agg(
                F.sum("c").alias("_tot"),
                F.count("*").alias("_dis"),
                F.max("c").alias("_max"),
            )
            .select(
                "id",
                F.round(
                    (F.col("_tot") - F.col("_dis")) / F.col("_tot"), 6
                ).alias(f"dup{n}"),
                F.round(F.col("_max") / F.col("_tot"), 6).alias(f"top{n}"),
            )
        )
        out = out.join(
            per.withColumnRenamed("id", id_col), id_col, "left"
        ).select(
            *out.columns,
            F.coalesce(f"dup{n}", F.lit(0.0)).alias(f"dup{n}"),
            F.coalesce(f"top{n}", F.lit(0.0)).alias(f"top{n}"),
        )
    return out


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-self-trained unigram LM quality score — the deterministic
    cousin of CCNet's (Wenzek et al. 2020) LM-perplexity filter: score each
    doc by the mean information content of its tokens under the corpus's
    OWN unigram distribution. Low scores flag boilerplate/template spam
    (all stop-tokens), very high scores flag gibberish/encoding garbage
    (all hapax tokens); the keep-band in between is the curation gate.

    Engine-exact by construction: per-token surprisal is the INTEGER
    binary order of magnitude of the inverse frequency,

        s(t) = floor(log2(N div c(t))) = length(bin(N div c)) - 1

    (the bin-length trick functions/sketches.py proved portable), so the
    only float op is the final rounded division sum/len. A true ln-based
    perplexity would differ across engines in the last ULP and is not
    oracle-checkable; the integer bucketing preserves the ranking signal
    curation thresholds actually use.

    Scale shape: one explode over the corpus tokens; vocab = one
    partial-agg groupBy(token); total N rides in as a broadcast 1-row
    relation; the token->surprisal annotate is the one corpus-sized
    shuffle join (same cost class as inverted_index — swap in a broadcast
    top-K vocab with a constant tail surprisal when the full vocab
    doesn't fit); then one groupBy(id). No Python anywhere.
    """
    from gnarly_spark.operators.dedup import normalize_text

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
    ).where(F.col("t") != "")
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("bigint").alias("n"))
    surp = vocab.crossJoin(F.broadcast(total)).select(
        "t",
        (F.length(F.bin(F.expr("n div c"))) - 1).cast("bigint").alias("s"),
    )
    per = (
        toks.join(surp, "t")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("s").alias("ssum"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            F.coalesce(
                F.round(F.col("ssum") / F.col("n_tokens"), 6), F.lit(0.0)
            ).alias("surprisal"),
        )
    )


def bigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-self-trained bigram LM quality score with Stupid Backoff
    (Brants et al. 2007, "Large Language Models in Machine Translation") —
    the 2-gram upgrade of unigram_surprisal: a doc full of common words in
    IMPLAUSIBLE order (word-salad spam, shuffled scrape garbage) scores
    high here while sailing through the unigram gate.

    Per transition (w_{i-1} -> w_i), integer log2 surprisal buckets:

        seen  (corpus bigram count >= min_count):
            s = floor(log2(c(prev) div c(prev,cur)))
        backoff (rare/unseen combination):
            s = floor(log2(N div c(cur))) + 1

    The +1 is the integer form of the alpha = 1/2 backoff penalty (true
    Stupid Backoff's 0.4 would leave the integers; 1/2 keeps the score
    engine-exact bit-for-bit, same rationale as the bin-length log2).
    ``min_count`` matters because the corpus scores ITSELF: every bigram
    in a doc occurs at least once in training, so with min_count=1 backoff
    would never fire — hapax transitions are exactly the "implausible
    order" signal, so they back off by default.

    Output: (id_col, n_transitions, surprisal, backoff_frac) — the only
    float ops are the two final rounded divisions; backoff_frac (share of
    transitions that backed off) is itself a gibberish signal.

    Scale shape: tokenize once into arrays (map-only), pair via
    slice+arrays_zip (map-only, no self-join); bigram counts = one
    partial-agg groupBy; per-distinct-bigram and per-vocab-entry score
    tables are computed on the SMALL relations, then the corpus transition
    stream pays exactly two shuffle joins (bigram score, backoff score) —
    the same cost class as unigram_surprisal's one, never a window or a
    per-doc loop. No Python anywhere.
    """
    from gnarly_spark.operators.dedup import normalize_text

    w = docs.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
        ).alias("w"),
    )
    toks = w.select("id", F.explode("w").alias("t"))
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    total = vocab.agg(F.sum("cu").cast("bigint").alias("n"))
    pairs = (
        w.where(F.size("w") >= 2)
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 1)").alias("p"),
                    F.expr("slice(w, 2, size(w) - 1)").alias("c"),
                )
            ).alias("u"),
        )
        .select("id", F.col("u.p").alias("p"), F.col("u.c").alias("c"))
    )
    cb = (
        pairs.groupBy("p", "c")
        .agg(F.count(F.lit(1)).alias("cb"))
        .where(F.col("cb") >= F.lit(int(min_count)))
    )
    # score tables on the small relations, not the corpus stream
    seen = cb.join(vocab.select(F.col("t").alias("p"), "cu"), "p").select(
        "p",
        "c",
        (F.length(F.bin(F.expr("cu div cb"))) - 1).cast("bigint").alias("s_seen"),
    )
    back = vocab.crossJoin(F.broadcast(total)).select(
        F.col("t").alias("c"),
        (F.length(F.bin(F.expr("n div cu")))).cast("bigint").alias("s_back"),
    )  # length(bin) - 1 + 1: the -1 (log2) and +1 (penalty) cancel
    scored = (
        pairs.join(seen, ["p", "c"], "left")
        .join(back, "c")
        .select(
            "id",
            F.coalesce("s_seen", "s_back").alias("s"),
            F.col("s_seen").isNull().cast("bigint").alias("backed"),
        )
    )
    per = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.sum("s").alias("ssum"),
        F.sum("backed").alias("nback"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trans", F.lit(0).cast("bigint")).alias("n_transitions"),
            F.coalesce(
                F.round(F.col("ssum") / F.col("n_trans"), 6), F.lit(0.0)
            ).alias("surprisal"),
            F.coalesce(
                F.round(F.col("nback") / F.col("n_trans"), 6), F.lit(0.0)
            ).alias("backoff_frac"),
        )
    )


def chunk_passages(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window passage chunking — the retrieval/pretraining prep
    step that turns long documents into fixed-size overlapping passages
    (stride < chunk_tokens keeps boundary context in two chunks, the
    standard RAG / BERT-style windowing).

    Chunk starts are 0, stride, 2*stride, ... up to the last start that
    still exposes a NEW token (ceil((n - chunk)/stride) windows after the
    first); the final chunk may be short. A doc shorter than one chunk
    yields exactly one chunk (itself); empty/null docs yield none.

    Scale shape: map-only — split, one transform over the start indices,
    one explode. No shuffle at all; chunking 10^10 docs is a single scan.
    Output: (id, chunk_idx, n_tokens, chunk_text).
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    from gnarly_spark.operators.dedup import normalize_text

    w = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(w)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride), as integers
    n_win = 1 + F.expr(
        f"CAST((greatest(size(_w) - {chunk_tokens}, 0) + {stride} - 1)"
        f" div {stride} AS INT)"
    )
    base = docs.select(F.col(id_col).alias("id"), w.alias("_w")).where(
        (F.col("_w").isNotNull()) & (F.size("_w") > 0) & (F.element_at("_w", 1) != "")
    )
    chunks = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda i: F.slice(
                    F.col("_w"), i * stride + 1, chunk_tokens
                ),
            )
        ).alias("chunk_idx", "_c"),
    )
    return chunks.select(
        "id",
        "chunk_idx",
        F.size("_c").cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", "_c").alias("chunk_text"),
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 64,
    salt: str = "42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the last step of
    a training-data pipeline (the data loader reads shard files
    sequentially; the pseudo-random ORDER must be baked into the layout).

    sort_key = the first 60 bits of md5(salt:id) (engine-portable, no RNG
    state); shard = sort_key mod n_shards. Reading shards in (shard,
    sort_key) order IS the global permutation; re-running, appending, or
    changing engines never moves a doc (change `salt` for a fresh epoch
    permutation). Map-only — the one shuffle happens in `write_shards`'
    range repartition, never here.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return docs.withColumn("sort_key", h).withColumn(
        "shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("int")
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 64,
    salt: str = "42",
    id_col: str = "doc_id",
) -> int:
    """Write the training-ready sharded corpus: parquet partitioned by
    shard, rows within every file sorted by sort_key.

    repartitionByRange(n_shards, shard, sort_key) — NOT repartition(shard):
    range partitioning keeps each output partition a contiguous sorted
    slice so every shard writes in parallel with no post-sort, while a
    hash repartition on shard serializes whole shards through single
    tasks (the COW-rewrite gotcha). Returns n_shards.
    """
    (
        shard_assign(docs, n_shards=n_shards, salt=salt, id_col=id_col)
        .repartitionByRange(n_shards, "shard", "sort_key")
        .sortWithinPartitions("shard", "sort_key")
        .write.partitionBy("shard")
        .parquet(path)
    )
    return n_shards


def _dsir_grams(
    docs: DataFrame,
    is_target,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, tgt, k): one row per bigram, k = hashed bucket. Map-only
    (split + slice + arrays_zip + md5); cheaper to recompute than to
    checkpoint (BENCH.md round-3 lineage A/B)."""
    from gnarly_spark.operators.dedup import normalize_text

    w = docs.select(
        F.col(id_col).alias("id"),
        is_target.cast("bigint").alias("tgt"),
        F.filter(
            F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
        ).alias("w"),
    )
    return (
        w.where(F.size("w") >= 2)
        .select(
            "id",
            "tgt",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 1)").alias("p"),
                    F.expr("slice(w, 2, size(w) - 1)").alias("c"),
                )
            ).alias("u"),
        )
        .select(
            "id",
            "tgt",
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(" ", "u.p", "u.c")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % int(n_buckets)
            ).alias("k"),
        )
    )


def dsir_bucket_stats(
    docs: DataFrame,
    is_target,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-bucket bigram counts (k, cnt_r, cnt_t) — the sufficient
    statistic of DSIR's two hashed bag-of-ngrams models. ABELIAN (counts
    sum), so per-batch stats fold into corpus stats exactly; one
    partial-agg groupBy collapsing to n_buckets rows."""
    return _dsir_grams(docs, is_target, n_buckets, text_col, id_col).groupBy(
        "k"
    ).agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.sum("tgt").cast("bigint").alias("cnt_t"),
    )


def dsir_lam(
    stats: DataFrame, n_buckets: int = 1024, scale_bits: int = 20
) -> DataFrame:
    """(k, lam) integer log2 importance table from bucket stats:

        C   = ((R + m) << scale_bits) div (T + m)     -- corpus scalar
        lam = len(bin(max((cnt_t+1) * C div (cnt_r+1), 1))) - 1 - scale_bits

    All-integer (bin-length log2) -> bit-identical across engines. Tiny
    (n_buckets rows); broadcast it into scoring."""
    m, sb = int(n_buckets), int(scale_bits)
    totals = stats.agg(
        F.sum("cnt_r").cast("bigint").alias("r_tot"),
        F.sum("cnt_t").cast("bigint").alias("t_tot"),
    )
    return stats.crossJoin(F.broadcast(totals)).select(
        "k",
        (
            F.length(
                F.bin(
                    F.expr(
                        f"greatest(((cnt_t + 1) * (((r_tot + {m}) * {1 << sb})"
                        f" div (t_tot + {m}))) div (cnt_r + 1), 1)"
                    )
                )
            )
            - 1
            - sb
        )
        .cast("bigint")
        .alias("lam"),
    )


def dsir_unseen_lam(
    stats: DataFrame, n_buckets: int = 1024, scale_bits: int = 20
) -> int:
    """The lam value of a bucket ABSENT from the stats (cnt_t = cnt_r = 0
    under add-1 smoothing): floor(log2(C)) - scale_bits. Pass it to
    `dsir_score` when scoring docs NOT folded into the stats — e.g. a new
    micro-batch against the reducer's corpus stats — so novel bigrams get
    the smoothed weight instead of silently dropping. Driver-side scalar
    (a 2-number aggregate, same class as the lake's manifest reads)."""
    m, sb = int(n_buckets), int(scale_bits)
    row = stats.agg(
        F.sum("cnt_r").cast("bigint").alias("r"),
        F.sum("cnt_t").cast("bigint").alias("t"),
    ).first()
    c = ((int(row["r"] or 0) + m) << sb) // (int(row["t"] or 0) + m)
    return max(c, 1).bit_length() - 1 - sb


def dsir_score(
    docs: DataFrame,
    lam: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    unseen_lam: int = 0,
) -> DataFrame:
    """Score docs against a (k, lam) table: (id_col, n_grams, dsir_logw).
    One broadcast join + the groupBy(id) shuffle; docs with <2 tokens get
    (0, 0). The lam table may come from `dsir_lam` over whole-corpus
    stats OR over incrementally-folded reducer stats — same scores.

    ``unseen_lam``: weight for bigrams hashing to a bucket ABSENT from
    the lam table (left join + coalesce, so the gram always counts in
    n_grams — an inner join would silently drop it, review finding).
    Scoring the corpus the stats were built from never hits it (every
    bucket is observed — the dsir_weights path); scoring NEW docs
    against prior stats does, so pass `dsir_unseen_lam(stats)` there."""
    grams = _dsir_grams(
        docs, F.lit(False), n_buckets, text_col, id_col
    ).drop("tgt")
    per = (
        grams.join(F.broadcast(lam), "k", "left")
        .withColumn(
            "lam",
            F.coalesce("lam", F.lit(int(unseen_lam)).cast("bigint")),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam").cast("bigint").alias("logw"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce("logw", F.lit(0).cast("bigint")).alias("dsir_logw"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 1024,
    scale_bits: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc by
    how target-like its hashed-bigram distribution is, the standard
    domain-matching selection step between quality gates and mixture
    sampling (select by weight, then `mixture_sample` the survivors).

    Composition of the three stages above (stats -> lam -> score) over
    one corpus: bag-of-hashed-bigrams with ``n_buckets`` buckets
    (md5-derived, the repo's engine-portable hash); per-bucket integer
    log2 importance lam(k) ~= floor(log2(p_t(k) / p_r(k))) (add-1
    smoothed, exact integer formulation in `dsir_lam`), so, like
    unigram_surprisal's bin-length trick, every op is integer and the
    score is bit-identical across engines; a doc's log-weight is the sum
    of its bigrams' lam values. True float log-ratios differ in the last
    ULP across engines and are not oracle-checkable; integer log2
    buckets preserve the ranking DSIR actually thresholds on.

    ``is_target`` is a boolean Column marking the target-domain exemplar
    docs (they stay in the raw estimate too — DSIR fits q on the full
    crawl). Docs with <2 tokens get (0, 0).

    Integer-range bound: (R + m) << scale_bits must fit int64, so with
    scale_bits=20 the corpus may hold up to 2^43 ≈ 8.8e12 bigrams; at
    100 TB (~10^13 tokens) drop scale_bits to 16 (precision is still
    1/65536 of a log2) or compute C once driver-side in Python ints.

    Scale shape: bigrams are map-only (the bigram_surprisal shape);
    bucket stats are ONE partial-agg groupBy collapsing to n_buckets
    rows; the lam table is tiny and broadcast, so the corpus stream pays
    a broadcast join plus the one real shuffle, groupBy(id). No Python
    anywhere. For the INCREMENTAL variant (stats folded per micro-batch
    from the CDC feed), see `dsir_stats_reducer`.

    Output: (id_col, n_grams, dsir_logw) — select via a logw threshold
    (or Gumbel top-k on md5 noise) downstream; this operator never sorts
    globally.
    """
    stats = dsir_bucket_stats(docs, is_target, n_buckets, text_col, id_col)
    lam = dsir_lam(stats, n_buckets, scale_bits)
    return dsir_score(docs, lam, n_buckets, text_col, id_col)


def dsir_stats_reducer(
    is_target,
    text_of=None,
    name: str = "dsir_stats",
    n_buckets: int = 1024,
):
    """Pipeline integration: an AppendReducer that maintains DSIR's
    bucket statistics INCREMENTALLY as crawls stream through the CDC
    engine — each micro-batch appends the (k, cnt_r, cnt_t) collapse of
    its own insert/update pages (O(batch) work, <= n_buckets rows per
    batch), and ``dsir_stats_read`` folds them into corpus stats for
    `dsir_lam`. Scoring a new batch is then O(batch) with the lam table
    broadcast — the corpus is never re-read.

    Semantics: observational, like link_census_reducer — a crawl that
    happened contributes its n-grams even if a later reorg reverts the
    page state (reorgs don't un-crawl); deletes carry no text and add
    nothing; refires no-op via AppendReducer's batch-path guard.

    ``is_target``: boolean Column over the changelog row (e.g.
    ``F.col("lang") == "en"``). ``text_of``: Column producing the doc
    text (default: decode the html payload)."""
    from gnarly_spark.reducers import AppendReducer

    def project(batch: DataFrame) -> DataFrame:
        pages = batch.where(F.col("op").isin("insert", "update")).select(
            F.col("url").alias("doc_id"),
            (
                text_of if text_of is not None else F.col("html").cast("string")
            ).alias("text"),
            is_target.alias("tgt"),
        )
        return dsir_bucket_stats(pages, F.col("tgt"), n_buckets)

    return AppendReducer(
        name=name,
        project=project,
        schema="k bigint, cnt_r bigint, cnt_t bigint",
    )


def dsir_stats_read(reducer, ctx) -> DataFrame:
    """Current corpus bucket stats: fold the per-batch partials (counts
    are abelian, so per-batch collapse then re-sum equals one global
    collapse — proven in pytest against `dsir_bucket_stats` over the
    full crawl)."""
    return (
        reducer.read(ctx)
        .groupBy("k")
        .agg(
            F.sum("cnt_r").cast("bigint").alias("cnt_r"),
            F.sum("cnt_t").cast("bigint").alias("cnt_t"),
        )
    )
