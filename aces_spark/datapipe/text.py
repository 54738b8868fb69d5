"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Column expressions (JVM-side, whole-stage codegen —
no Python UDFs in the hot path) over a ``documents`` table
``(doc_id, text, ...)``. Each has an exact ANSI-SQL equivalent so results
can be verified against a DuckDB oracle.

Determinism notes: every ratio is rounded explicitly so Spark and any SQL
oracle hash identically; fingerprints use md5 (identical hex output across
engines).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small built-in stopword seeds for the n-gram language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored token estimate: count of word/number/punctuation
    chunks (regex ``\\w+|[^\\w\\s]``), the classic pre-tokenizer split."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]")).cast("long")


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character statistics and quality ratios."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_space = F.length(F.regexp_replace(text, r"[^ \t\n]", ""))
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        token_count(text).alias("n_tokens"),
        F.round(n_alpha / safe, 4).alias("alpha_ratio"),
        F.round(n_digit / safe, 4).alias("digit_ratio"),
        F.round(n_punct / safe, 4).alias("punct_ratio"),
        F.round(n_space / safe, 4).alias("space_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite heuristic quality score in [0, 1]: length band + alpha
    ratio + mean-word-length band (the usual C4/Gopher-style gates,
    expression-only)."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    n_tokens = token_count(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    word_len_ok = (mean_word_len >= 3) & (mean_word_len <= 12)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(word_len_ok, 0.3).otherwise(0.0)
        + F.round(alpha_ratio * 0.3, 4)
    )
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-marker language heuristic: count word-boundary hits
    of per-language marker words; predict the argmax (ties broken by fixed
    language order en > de > fr > es)."""
    lower = F.lower(F.col(text_col))
    hit_cols = {}
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        hit_cols[f"{lang}_hits"] = F.regexp_count(lower, F.lit(pattern)).cast("long")

    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_hits = hit_cols[f"{langs[0]}_hits"]
    for lang in langs[1:]:
        cond = hit_cols[f"{lang}_hits"] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hit_cols[f"{lang}_hits"]).otherwise(best_hits)

    return df.select(
        "doc_id",
        *[c.alias(name) for name, c in hit_cols.items()],
        best.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    lowercased/whitespace-normalized alphanumeric text. Identical text
    modulo case/punctuation/whitespace ⇒ identical fingerprint."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.select(
        "doc_id",
        F.md5(F.encode(normalized, "UTF-8")).alias("fingerprint"),
    )
