"""PII detection and redaction for pretraining corpora.

The standard pre-release scrub pass: find and mask email addresses, IPv4
addresses, and phone-shaped numbers before text ships to a training run.
Pure Column expressions (JVM regex, whole-stage codegen — no Python UDFs),
with patterns deliberately restricted to syntax that behaves identically
in Java regex (Spark) and RE2 (DuckDB/Go): character classes, bounded
repetition, non-capturing groups, and ``\\b`` word boundaries — no
lookaround, no backreferences — so a SQL oracle reproduces every count
and the redacted-text digest bit-for-bit.

Scale shape: embarrassingly parallel row-local projection — no shuffle,
no join; the scan's column pruning reaches parquet untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"(?:\+\d{9,14}|\d{3}-\d{3}-\d{4})"

# redaction replaces longest-structure first: emails (which contain dots
# and digits) before IPs, IPs before bare phone shapes
_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def pii_count_exprs(text: Column) -> dict[str, Column]:
    """Per-category PII match counts as reusable expressions."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
    }


def pii_redact_expr(text: Column) -> Column:
    """Redacted text: every match replaced by its ``<CATEGORY>`` token,
    applied email → IP → phone (emails are redacted before their digit
    runs could feed the narrower patterns)."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII scrub summary:
    ``(doc_id, n_emails, n_ipv4, n_phones, redacted_len, redacted_digest)``.

    The digest (md5 of the redacted text) lets a pipeline verify the
    scrub deterministically without shipping the text anywhere; callers
    that want the redacted text itself use :func:`pii_redact_expr`.
    """
    text = F.col(text_col)
    counts = pii_count_exprs(text)
    redacted = pii_redact_expr(text)
    return df.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(F.encode(redacted, "UTF-8")).alias("redacted_digest"),
    )


def pii_density_filter(
    df: DataFrame,
    max_per_kchar: float = 5.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ACTION half of the scrub (r8): keep documents whose PII
    density (matches per 1000 chars) is at or under ``max_per_kchar``
    and emit their redacted text; PII-dense documents (address books,
    scraped directories, paste dumps) are dropped entirely rather than
    turned into placeholder soup.

    Output: ``(id_col, clean_text, n_pii, pii_per_kchar_tenths)``.
    Density is an integer in tenths-per-kchar via truncating ``div``
    (non-negative operands, so Spark's ``div`` and DuckDB's ``//``
    agree exactly); empty text keeps (density 0). Same map-only,
    zero-exchange shape as :func:`pii_scrub`."""
    text = F.col(text_col)
    counts = pii_count_exprs(text)
    n_pii = None
    for c in counts.values():
        n_pii = c if n_pii is None else n_pii + c
    staged = df.select(
        F.col(id_col),
        pii_redact_expr(text).alias("clean_text"),
        n_pii.cast("long").alias("n_pii"),
        F.length(text).cast("long").alias("__len"),
    )
    dens = F.expr("(n_pii * 10000) div greatest(__len, 1)").cast("long")
    thresh = int(round(max_per_kchar * 10))
    return staged.filter(dens <= F.lit(thresh)).select(
        id_col, "clean_text", "n_pii", dens.alias("pii_per_kchar_tenths")
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (r10) —
    the release-safety question for any user-derived training table:
    how many rows sit in an equivalence class smaller than ``k``?
    A record whose quasi-identifier tuple (ZIP-like region, segment,
    coarse numerics, ...) is shared by fewer than ``k`` rows is
    re-identifiable by linkage (Sweeney 2002); curation either
    generalizes those cells further or drops them.

    Output: one row per equivalence class —
    ``(*quasi_cols, class_n, at_risk)`` with ``at_risk = class_n < k``.
    Deterministic and fully SQL-mirrorable; callers aggregate
    ``sum(class_n) filter (at_risk)`` for the headline risk count or
    join back on the quasi columns to drop/generalize the rows.

    Scale shape: ONE hash aggregate on the quasi-identifier key (the
    class count), map-side partial combine; linear, one exchange, no
    joins — the same plan at 100 TB with the key space (not the corpus)
    as the reduce-side cardinality."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report: need at least one quasi column")
    if k < 2:
        raise ValueError("k_anonymity_report: k must be >= 2")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_n")
    ).select(
        *quasi_cols,
        "class_n",
        (F.col("class_n") < k).alias("at_risk"),
    )
