"""Text-analysis functions for large-scale training-data pipelines.

All are pure column expressions (whole-stage codegen; no Python in the
hot path) with exact ANSI-SQL equivalents so each has a DuckDB oracle.
The reference's text handling is regex/string munging in row loops
(SURVEY.md §2.8 C1-C6); these are the scaled-up equivalents plus the
pipeline ops a 100 TB corpus needs: language-ID, quality scoring,
token counting, fingerprinting.

One exception to expression-only: Unicode NFC normalization
(``nfc_normalize``) has no Spark builtin, so it is an Arrow-batched
pandas UDF — the sanctioned vectorized escape hatch (§2.10), with
DuckDB's native ``nfc_normalize`` as its oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# tiny per-language stopword marker sets (n-gram heuristic language-ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "y"],
}

# BPE-ish word/number/symbol tokenizer
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def nfc_normalize(col: str | Column) -> Column:
    """Unicode NFC normalization — canonically-equivalent byte forms
    ('e' + U+0301 vs precomposed 'é') must collapse BEFORE hashing,
    dedup, or fingerprinting, or visually identical documents hash
    apart. No Spark builtin exists, so this is a vectorized pandas UDF
    (pandas ``Series.str.normalize`` over Arrow batches — never per-row
    over py4j). ONE module-level UDF instance (creation needs no active
    session), so repeated uses share a resultId and a plan can
    deduplicate them. Oracle: DuckDB's native ``nfc_normalize``."""
    return _nfc_udf(_c(col))


def ws_tokens(col: str | Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    c = _c(col)
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), "\\s+")
    )


def token_count(col: str | Column) -> Column:
    return F.size(ws_tokens(col)).cast("long")


def regex_token_count(col: str | Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), 0)).cast("long")


def alpha_ratio(col: str | Column) -> Column:
    c = _c(col)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, "[^A-Za-z]", "")) / F.length(c)
    )


def punct_ratio(col: str | Column) -> Column:
    c = _c(col)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, "[^.,;:!?'\"()\\[\\]{}-]", "")) / F.length(c)
    )


def stopword_count(col: str | Column, words: list[str]) -> Column:
    toks = ws_tokens(F.lower(_c(col)))
    return F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")


def stopword_ratio(col: str | Column, words: list[str] | None = None) -> Column:
    words = words or LANG_MARKERS["en"]
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(col, words) / n)


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0,1]: length sweet spot, mostly
    alphabetic, not punctuation-heavy, some stopwords (prose-ness).
    Weighted sum of bounded components; deterministic, rounded to 6dp
    so engine/oracle float comparison is stable.
    """
    c = _c(col)
    length_component = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    alpha_component = alpha_ratio(c)
    punct_penalty = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    return F.round(
        0.25 * length_component
        + 0.35 * alpha_component
        + 0.2 * punct_penalty
        + 0.2 * stop_component,
        6,
    )


def detect_lang(col: str | Column) -> Column:
    """n-gram/stopword-marker language ID: argmax of per-language marker
    hits, 'und' (undetermined) when no marker fires. Deterministic
    tiebreak by language code order."""
    c = _c(col)
    scores = {lang: stopword_count(c, words) for lang, words in sorted(LANG_MARKERS.items())}
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    # process reverse-sorted with >= so the alphabetically-first max wins
    for lang in sorted(scores, reverse=True):
        best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(scores[lang] >= best_score, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def shingles(col: str | Column, k: int = 5) -> Column:
    """Character k-grams of the text (array<string>)."""
    c = _c(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))),
        lambda i: F.substring(c, i, k),
    )


def fingerprint(col: str | Column, k: int = 8) -> Column:
    """Document fingerprint: lexicographic min of md5 over character
    k-grams of whitespace-normalized text (winnowing-style single-band
    MinHash). Stable across engines — md5 is universal.

    The normalization chain is LET-BOUND through a single-element
    ``transform`` so it evaluates once per row: expressions captured
    inside a HOF lambda re-evaluate per element, and ``shingles``
    references its input per shingle — passing the regex chain directly
    would re-normalize the whole document O(length) times (the same
    trap ``bigram_array`` hit)."""
    normalized = F.regexp_replace(F.lower(F.trim(_c(col))), "\\s+", " ")
    return F.element_at(
        F.transform(
            F.array(normalized),
            lambda n: F.array_min(F.transform(shingles(n, k), F.md5)),
        ),
        1,
    )


def dup_token_fraction(col: str | Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens that are
    repeats of an earlier token (0 for empty/all-distinct text). Pure
    expression — ``1 - |distinct| / |tokens|``."""
    toks = ws_tokens(col)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(toks)) / n, 6)
    )


def bigram_array(col: str | Column) -> Column:
    """Adjacent word bigrams as 'w1 w2' strings (empty below 2 tokens).

    ``zip_with`` over the two shifted slices, NOT a position
    ``transform`` with ``element_at(toks, i)``: expressions captured
    inside a higher-order-function lambda are re-evaluated PER ELEMENT,
    so the element_at form recomputed the whole split for every bigram
    — O(tokens²) per document (measured 19× slower at sf0.1). The
    slices are top-level arguments, evaluated once per row."""
    toks = ws_tokens(col)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )


def top_bigram_fraction(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """Gopher repetition signal: fraction of all bigram occurrences
    taken by the single most frequent bigram, per document (0 when the
    doc has <2 tokens). The mode is found by explode → count per
    (doc, bigram) → max/sum per doc: two partial-aggregated shuffles
    keyed by doc id, never a per-row interpreted fold — at corpus scale
    this is the same plan shape as the shingle pipeline."""
    pairs = df.select(
        F.col(id_col), F.explode_outer(bigram_array(text_col)).alias("_bg")
    )
    counts = pairs.groupBy(id_col, "_bg").agg(F.count(F.lit(1)).alias("_c"))
    return counts.groupBy(id_col).agg(
        F.when(
            F.max(F.col("_bg").isNotNull().cast("int")) == 0, F.lit(0.0)
        )
        .otherwise(F.round(F.max("_c") / F.sum("_c"), 6))
        .alias("top_bigram_fraction")
    )
