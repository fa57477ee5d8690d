"""Text analysis for LLM-data pipelines ([EXT] scope, SURVEY §7 Phase 4):
language ID, quality scoring, token counting, fingerprinting — all over
``documents``.

Everything here is pure JVM column expressions (regex engines differ
between Spark/Java and DuckDB/RE2, so patterns are restricted to the
shared dialect: char classes, alternation, word boundaries). Ratios are
computed as one double division of exact integer counts → deterministic
across engines.

Scale: each operator is a single stateless projection over the scan —
embarrassingly parallel, no shuffle, fully codegen'd; this is the shape
that sustains 100 TB (the only shuffle in this file is the optional
fingerprint-dedup aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import normalized, pattern_count
from ..sources.registry import load_table
from .spec import QuerySpec

# language marker stopwords (disjoint across languages; lowercase match)
_LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|with|for)\b",
    "de": r"\b(der|und|die|das|nicht)\b",
    "fr": r"\b(le|et|les|des|une)\b",
    "es": r"\b(el|y|los|las|una)\b",
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority

_WORD = r"[A-Za-z]+"
_BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"  # letters run | digit | symbol
_PUNCT = r"[.,!?;:]"


def text_quality_score(spark, sf_dir):
    """Quality features + composite score: length, word count, mean word
    length, punctuation density, stopword ratio."""
    docs = load_table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_words = pattern_count(lower, _WORD)
    n_punct = pattern_count(F.col("text"), _PUNCT)
    n_stop = pattern_count(lower, _LANG_MARKERS["en"])
    n_chars = F.length(F.col("text"))
    word_ratio = F.round(n_stop.cast("double") / n_words.cast("double"), 6)
    punct_density = F.round(n_punct.cast("double") / n_chars.cast("double"), 6)
    avg_word_len = F.round(n_chars.cast("double") / n_words.cast("double"), 6)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        punct_density.alias("punct_density"),
        word_ratio.alias("stopword_ratio"),
    )


TEXT_QUALITY_ORACLE = rf"""
SELECT doc_id,
  length(text) AS n_chars,
  len(regexp_extract_all(lower(text), '{_WORD}')) AS n_words,
  round(length(text) * 1.0
        / len(regexp_extract_all(lower(text), '{_WORD}')), 6) AS avg_word_len,
  round(len(regexp_extract_all(text, '[.,!?;:]')) * 1.0
        / length(text), 6) AS punct_density,
  round(len(regexp_extract_all(lower(text), '\b(the|and|of|with|for)\b')) * 1.0
        / len(regexp_extract_all(lower(text), '{_WORD}')), 6) AS stopword_ratio
FROM documents
"""


def text_lang_id(spark, sf_dir):
    """Heuristic language ID: argmax of per-language marker-stopword
    counts (tie-break by fixed priority), NULL-safe 'und' when no marker
    hits. Emits predicted vs labeled lang for audit."""
    docs = load_table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    counts = {lang: pattern_count(lower, pat) for lang, pat in _LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in reversed(_LANG_ORDER):  # earlier langs win ties (applied last)
        best = F.when(counts[lang] >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, counts[lang])
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.alias("predicted_lang"),
        *[counts[lang].alias(f"n_{lang}") for lang in _LANG_ORDER],
    )


_LANG_COUNT_SQL = {
    lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
    for lang, pat in _LANG_MARKERS.items()
}

TEXT_LANG_ORACLE = rf"""
WITH c AS (
  SELECT doc_id, lang AS labeled_lang,
         {_LANG_COUNT_SQL['en']} AS n_en, {_LANG_COUNT_SQL['de']} AS n_de,
         {_LANG_COUNT_SQL['fr']} AS n_fr, {_LANG_COUNT_SQL['es']} AS n_es
  FROM documents)
SELECT doc_id, labeled_lang,
  CASE
    WHEN n_en >= greatest(n_de, n_fr, n_es, 1) THEN 'en'
    WHEN n_de >= greatest(n_fr, n_es, 1) THEN 'de'
    WHEN n_fr >= greatest(n_es, 1) THEN 'fr'
    WHEN n_es >= 1 THEN 'es'
    ELSE 'und' END AS predicted_lang,
  n_en, n_de, n_fr, n_es
FROM c
"""


def text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / single digits / single symbols) — the standard cheap
    proxy for LLM token budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = pattern_count(F.col("text"), _BPE_ISH)
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.round(bpe.cast("double") / ws.cast("double"), 6).alias("tokens_per_word"),
    )


TOKEN_COUNT_ORACLE = rf"""
SELECT doc_id,
  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '{_BPE_ISH}')) AS bpe_ish_tokens,
  round(len(regexp_extract_all(text, '{_BPE_ISH}')) * 1.0
        / len(string_split_regex(trim(text), '\s+')), 6) AS tokens_per_word
FROM documents
"""


def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over the normalized text (lowercase,
    alnum-only, collapsed whitespace) — robust to case/punctuation noise;
    grouped to expose normalized-duplicate clusters."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(normalized(F.col("text"))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
    )


FINGERPRINT_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS fingerprint
  FROM documents)
SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM norm GROUP BY fingerprint
"""


def text_pii_redact(spark, sf_dir):
    """PII redaction: synthesize an email+phone header per doc (the
    corpus has none), then regex-redact — demonstrates the masking
    operator end-to-end with verifiable output."""
    docs = load_table(spark, sf_dir, "documents")
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" :: "),
            F.col("text"),
        ).alias("text"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"[0-9]{3}-[0-9]{4}"
    return with_pii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
    )


PII_ORACLE = r"""
WITH with_pii AS (
  SELECT doc_id,
         concat('contact user', CAST(doc_id AS VARCHAR),
                '@example.com or 555-01',
                lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
                ' :: ', text) AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
FROM with_pii
"""


def text_repetition_score(
    spark, sf_dir, dup_bigram_max: float = 0.2, top_word_max: float = 0.3
):
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 "repetitious text" filters — public paper): the fraction of
    word 2-grams that are duplicates and the fraction of tokens taken by
    the single most frequent word, plus the resulting keep/drop flag.

    Spark-first shape: BOTH signals are computed with higher-order array
    functions inside one stateless projection — zero shuffle, the same
    embarrassingly-parallel scan shape as the rest of this file.

    r12 rework (44 s → 2.6 s at sf10, same values): (1) the top-word
    count was O(distinct × tokens) per doc (filter-per-distinct-word,
    4.3 s per evaluation) — an ``array_sort`` + run-length ``aggregate``
    fold is O(n log n) and measured 0.9 s; (2) bigram distinct counting
    built per-pair concat STRINGS (10.1 s) — ``zip_with`` over two
    slices into structs skips the string allocations entirely (2.1 s;
    tokens cannot contain the split char, so (a,b) structs and
    "a b" strings have identical distinct counts); (3) the fracs are
    computed in a sub-projection so the keep-flag reuses the columns
    instead of re-evaluating both signals.

    r14 constant-factor pass: the word array is MATERIALIZED once as
    `w` instead of re-splitting `text` six times per row across the
    HOF arguments (each argument evaluates once — not the quantize
    O(d²) bug — but six O(n) splits of the full document still paid
    ~1.4× the whole row): interleaved min-of-7 at sf10 4.059 → 2.924 s
    (−28%), w-column ahead in 7/7 adjacent pairs
    (plans/r14/ab_rep_wcol.json). CollapseProject keeps the stage
    (split is non-cheap and `w` has six consumers)."""
    docs = load_table(spark, sf_dir, "documents")
    warr = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    top_word_n = F.expr(
        """
        aggregate(array_sort(w),
          struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best),
          (a, x) -> struct(x,
             IF(x = a.prev, a.run + 1, 1),
             greatest(a.best, IF(x = a.prev, a.run + 1, 1))),
          a -> a.best)"""
    )
    n_dist_bigrams = F.expr(
        """
        size(array_distinct(zip_with(
          slice(w, 1, size(w) - 1),
          slice(w, 2, size(w) - 1),
          (a, b) -> struct(a, b))))"""
    )
    sized = warr.select(
        "doc_id",
        F.size("w").alias("n_toks"),
        n_dist_bigrams.alias("n_dist_big"),
        top_word_n.alias("top_n"),
    )
    dup_frac = F.when(
        F.col("n_toks") - 1 > 0,
        F.round(
            F.lit(1.0)
            - F.col("n_dist_big") / (F.col("n_toks") - 1).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    top_frac = F.round(F.col("top_n") / F.col("n_toks").cast("double"), 6)
    scored = sized.select(
        "doc_id",
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_word_frac"),
    )
    return scored.select(
        "doc_id",
        "dup_bigram_frac",
        "top_word_frac",
        (
            (F.col("dup_bigram_frac") <= F.lit(dup_bigram_max))
            & (F.col("top_word_frac") <= F.lit(top_word_max))
        ).alias("keep"),
    )


TEXT_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
b AS (
  SELECT doc_id, w,
         list_transform(generate_series(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i + 1]) AS bg
  FROM t),
s AS (
  SELECT doc_id,
         CASE WHEN len(bg) > 0
              THEN round(1.0 - len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE), 6)
              ELSE 0.0 END AS dup_bigram_frac,
         round(list_max(list_transform(list_distinct(w),
                 u -> len(list_filter(w, x -> x = u))))
               / CAST(len(w) AS DOUBLE), 6) AS top_word_frac
  FROM b)
SELECT doc_id, dup_bigram_frac, top_word_frac,
       (dup_bigram_frac <= 0.2 AND top_word_frac <= 0.3) AS keep
FROM s
"""


def text_word_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the word distribution (nats) —
    the vocabulary-diversity quality signal (low entropy = repetitive /
    boilerplate text; used alongside the Gopher-style repetition
    rules in `text_repetition_score`). H = ln n − (Σ c·ln c)/n over the
    per-doc term histogram.

    Determinism by QUANTIZATION: a float Σ c·ln c depends on summation
    order and can never hash-match across engines, so each term's ln c
    is quantized to 1e-6 nats FIRST (round(1e6·ln c) as BIGINT) and the
    weighted sum runs in exact integer arithmetic — order-free, with a
    stated error bound ≤ 1e-6 nats, absorbed by the round-6 emit.

    Scale shape: two doc-keyed aggregations with map-side combine
    (token histogram, then per-doc fold); memory bounded by per-doc
    distinct terms. Docs with zero tokens drop out in both engines
    (explode/unnest of an empty match list)."""
    from .tokenbase import token_frame

    # shared tokenized frame (r13 review) — same '[a-z]+' contract
    toks = token_frame(spark, sf_dir).select(
        "doc_id", F.explode("arr").alias("term")
    )
    tc = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.col("c")
            * F.round(F.lit(1000000.0) * F.log("c")).cast("bigint")
        ).alias("s"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("s").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1000000.0)
    )
    return per_doc.select(
        "doc_id", "n_tokens", "n_distinct", F.round(h, 6).alias("word_entropy")
    )


WORD_ENTROPY_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents),
tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
         sum(c * CAST(round(1000000.0 * ln(c)) AS BIGINT)) AS s
  FROM tc GROUP BY 1)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_distinct,
       round(ln(CAST(n_tokens AS DOUBLE))
             - CAST(s AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * 1000000.0), 6) AS word_entropy
FROM per_doc
"""


SPECS: list[QuerySpec] = [
    QuerySpec("text_word_entropy", text_word_entropy, WORD_ENTROPY_ORACLE),
    QuerySpec("text_pii_redact", text_pii_redact, PII_ORACLE),
    QuerySpec("text_quality_score", text_quality_score, TEXT_QUALITY_ORACLE),
    QuerySpec("text_lang_id", text_lang_id, TEXT_LANG_ORACLE),
    QuerySpec("text_token_count", text_token_count, TOKEN_COUNT_ORACLE),
    QuerySpec("text_fingerprint", text_fingerprint, FINGERPRINT_ORACLE),
    QuerySpec("text_repetition_score", text_repetition_score, TEXT_REPETITION_ORACLE),
]
