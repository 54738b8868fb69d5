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

import math

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


def mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    strict: bool = True,
) -> DataFrame:
    """Downsample to a TARGET MIX: find the largest corpus size ``T``
    whose stratum composition matches ``weights`` given availability
    (``T = min_s n_s / w_s`` — the scarcest weighted stratum binds, kept
    at 100%; abundant strata are hash-downsampled to ``w_s·T`` expected
    rows). Strata absent from ``weights`` are dropped.

    A WEIGHTED stratum absent from the DATA is an error by default
    (``strict=True``): by the formula its availability is zero, so
    ``T = 0`` and the honest answer is an empty corpus — silently
    renormalizing over the remaining strata would return a composition
    the caller did not ask for (and hides typos like ``"zh-cn"`` vs
    ``"zh"``). Pass ``strict=False`` to opt into renormalization.

    This is the "corpus mixing" step of a training-data pipeline ("40%
    web, 30% books, 30% code") expressed as pure availability math + the
    deterministic hash filter: the only cluster work beyond the row-local
    filter is one tiny per-stratum count (collected driver-side — bounded
    by the number of strata, same policy as the IVF auto-sizing hop).

    Keep-rates are quantized to basis points with ``floor(x·10⁴ + 0.5)``
    (the engine-exact rounding rule), so a SQL oracle recomputing the
    rates from the same counts reproduces the sample row-for-row.
    """
    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }
    missing = sorted(s for s, w in weights.items() if w > 0 and s not in counts)
    if missing and strict:
        raise ValueError(
            f"weighted strata absent from the data: {missing} — the target "
            "mix is unsatisfiable (T = 0); fix the stratum names or pass "
            "strict=False to renormalize over the present strata"
        )
    active = {s: w for s, w in weights.items() if s in counts and w > 0}
    if not active:
        raise ValueError("no stratum in `weights` exists in the data")
    t = min(counts[s] / w for s, w in active.items())
    rates = {}
    for s, w in active.items():
        threshold = math.floor(w * t / counts[s] * BUCKETS + 0.5)
        rates[s] = threshold / BUCKETS
    return stratified_sample(
        df, rates, strata_col=strata_col, key_col=key_col,
        default_rate=0.0, seed=seed,
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


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement — Efraimidis & Spirakis
    (2006) A-ExpJ: each row draws a deterministic uniform ``u`` from its
    id (md5-derived, reproducible anywhere), ranks by the exponential
    jitter ``-ln(u) / w``, and the k SMALLEST keys win. Inclusion
    probability is proportional to weight, the one-pass distributed
    recipe (per-partition top-k heaps + a k-row merge, never a global
    sort) for "sample 10k docs biased toward length/quality score".

    Output ``(id_col, weight_col, sample_key)``, the winners; ranking
    uses the 9-dp-rounded key with id tie-break (the repo's
    rank-on-rounded-score determinism rule). Rows with weight <= 0 or
    null are excluded (zero weight = never sampled; negative is a caller
    bug surfaced by the count, not a crash).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..functions.hashing import md5_long60

    h = md5_long60(F.col(id_col))
    # u in (0, 1]: (h + 1) / 2^60 — never 0, so ln(u) is finite
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = -F.log(u) / F.col(weight_col).cast("double")
    out = (
        # a null id would hash to a null key, which Spark sorts FIRST
        # ascending — it would silently win a top-k slot
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .select(
            F.col(id_col),
            F.col(weight_col),
            F.round(key, 9).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )
    return out
