"""Deterministic sampling for training-data pipelines.

Training mixes are built by *re-weighting strata* (language, source,
quality band) — e.g. "keep 30% of Common Crawl but 100% of books". Doing
that with ``rand()`` makes every run a different corpus; doing it with a
**hash of the stable document id** makes the sample a pure function of
the data — reproducible across runs, engines, and cluster sizes, and
consistent for a document that appears in several shards.

Two operators:

* :func:`stratified_sample` — per-stratum KEEP RATES. Row-local hash
  filter: no shuffle at all, the filter composes with parquet scan
  pruning, and the expected kept fraction per stratum converges to the
  rate (md5 buckets are uniform).
* :func:`stratified_take` — per-stratum EXACT-K. One window shuffle keyed
  by the stratum; rows are ranked by the same portable hash so the choice
  is deterministic, not first-k-by-storage-order. At extreme per-stratum
  cardinality the rank sort dominates — for top-k over a whole corpus use
  the ANN module's TakeOrdered pattern instead.

The hash is the md5-derived 32-bit bucket used across the dedup/ANN
modules (engine-portable: any SQL oracle reproduces it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space for rate quantization: rates are exact multiples of 1e-4
BUCKETS = 10_000


def sample_bucket_expr(key: Column, seed: int = 0) -> Column:
    """Deterministic bucket in [0, BUCKETS): first 8 hex chars of
    ``md5(seed | key)`` mod BUCKETS."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % BUCKETS


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row iff its key-hash bucket falls under its stratum's
    rate. Adds the ``sample_bucket`` column (useful for audit); strata
    absent from ``rates`` use ``default_rate``. Pure row-local filter —
    no shuffle, no join, reproducible everywhere."""
    bucket = sample_bucket_expr(F.col(key_col), seed)
    threshold = F.lit(int(round(default_rate * BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(threshold)
    return df.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < threshold
    )


def stratified_take(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by portable
    hash order (ties broken by key — fully deterministic). Adds
    ``sample_rank`` (1-based within the stratum)."""
    bucket = sample_bucket_expr(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(bucket.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
