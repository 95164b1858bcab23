"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs — so they scale linearly with
executors and stay inside Tungsten. Each operator is a narrow
(per-row) transform: no shuffle, fully pipelined with the parquet scan.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), language ID (stopword n-gram
heuristic), document fingerprinting (rolling/content hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: words, numbers, contractions, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+(?:'[a-z]+)?|[0-9]+|[^A-Za-z0-9\s]"

# Tiny stopword profiles for the n-gram language heuristic. Deterministic,
# dependency-free; real pipelines would swap in fastText — same plumbing.
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count — `size(split(trim(text), '\\s+'))`."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish token count via the tokenizer regex (regexp_count, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def quality_score(col: str | Column = "text") -> Column:
    """Heuristic quality in [0,1]: mean word length sanity, alpha ratio,
    punctuation ratio, stopword presence. Pure built-ins."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    n_tokens = token_count(c).cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    word_len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_hits = _stopword_hits(c, "en")
    stop_ok = F.when(stop_hits >= 2, F.lit(1.0)).otherwise(stop_hits.cast("double") / F.lit(2.0))
    score = (
        F.lit(0.35) * alpha_ratio
        + F.lit(0.25) * word_len_ok
        + F.lit(0.25) * stop_ok
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return F.round(score, 4)


def _stopword_hits(c: Column, lang: str) -> Column:
    lowered = F.lower(c)
    hits = F.lit(0)
    for w in _LANG_STOPWORDS[lang]:
        hits = hits + F.when(lowered.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
    return hits


def lang_id(col: str | Column = "text") -> Column:
    """Stopword-profile language ID over {en,de,fr,es}, 'und' if no hits.

    A CASE over per-language stopword hit counts; ties broken by profile
    order. Entirely JVM-side regex — scales as a narrow transform.
    """
    c = F.col(col) if isinstance(col, str) else col
    scores = {lang: _stopword_hits(c, lang) for lang in _LANG_STOPWORDS}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in ["en", "de", "fr", "es"]:
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def fingerprint(col: str | Column = "text") -> Column:
    """Deterministic 64-bit content fingerprint: xxhash64 of the
    whitespace-normalized lowercased text (document identity hash)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def fingerprint_md5(col: str | Column = "text") -> Column:
    """SQL-portable content fingerprint: md5 hex of the whitespace-
    normalized lowercased text — the oracle-checkable sibling of
    ``fingerprint`` (xxhash64), identical normalization."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(F.encode(normalized, "utf-8"))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns in one narrow pass."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_bpe_tokens", bpe_token_count(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fp", fingerprint(text_col))
    )
