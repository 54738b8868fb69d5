"""URL normalization and domain analytics for corpus curation.

Web-scale training corpora key their provenance (and much of their dedup)
on URLs — CCNet / RefinedWeb-style pipelines normalize URLs before using
them as dedup keys or per-domain quality signals. Everything here is pure
Column expressions (regex + array ops, JVM-side, codegen-friendly), and
every regex is mirrorable in ANSI-ish SQL so the DuckDB oracle can verify
values bit-for-bit: no ``parse_url`` (Spark-only) and no Python UDFs.

Normalization steps (order matters):

1. drop the fragment (``#...`` never reaches the server);
2. lowercase the scheme and authority (host names are case-insensitive;
   paths are NOT touched);
3. strip default ports (``http://h:80`` → ``http://h``, ``https://h:443``
   → ``https://h``);
4. remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) and the ``?`` itself if nothing survives.

At 100 TB all of this is row-local (zero shuffle); the downstream
per-domain aggregations key on the extracted domain, whose cardinality is
high enough to partition uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme + authority prefix (up to the first /, ?, or #)
_HEAD_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
#: host inside an already-lowercased URL (skips userinfo, stops at port)
_DOMAIN_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
#: tracking query parameters to strip
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def url_normalize_expr(url: Column) -> Column:
    """Normalized form of a URL column (see module docstring for steps)."""
    u = F.regexp_replace(url, r"#.*$", "")
    head = F.regexp_extract(u, _HEAD_RE, 1)
    # lowercase scheme+authority only; paths/queries stay case-sensitive
    u = F.concat(F.lower(head), u.substr(F.length(head) + 1, F.length(u)))
    # no lookahead (RE2-portable for the DuckDB oracle): consume the
    # delimiter-or-end in a group and reinstate it in the replacement
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#]|$)", r"$1$2")
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    base = F.regexp_replace(u, r"\?[^#]*", "")
    kept = F.filter(F.split(q, "&"), lambda p: ~p.rlike(_TRACKING_RE))
    newq = F.array_join(kept, "&")
    return (
        F.when(q == "", u)
        .when(newq == "", base)
        .otherwise(F.concat(base, F.lit("?"), newq))
    )


def domain_expr(norm_url: Column) -> Column:
    """Registrable host of an already-normalized URL (userinfo and port
    excluded). Suffix-list-aware eTLD+1 extraction needs a lookup table —
    join one against this column when that distinction matters."""
    return F.regexp_extract(norm_url, _DOMAIN_RE, 1)


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``norm_url`` and ``domain`` columns (row-local, zero
    shuffle)."""
    norm = url_normalize_expr(F.col(url_col))
    return df.withColumn("norm_url", norm).withColumn("domain", domain_expr(F.col("norm_url")))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain corpus report over raw URLs:
    ``(domain, n_urls, n_unique_urls)`` where uniqueness is measured on the
    NORMALIZED url — the count dedup-by-url would keep. One domain-keyed
    exchange; the distinct count is exact (per-domain scope, not global).
    """
    return (
        normalize_urls(df, url_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("norm_url").cast("long").alias("n_unique_urls"),
        )
    )
