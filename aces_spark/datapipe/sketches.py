"""Distinct-count sketches with ENGINE-PORTABLE determinism.

Spark ships ``approx_count_distinct`` (HyperLogLog++), but its xxhash64 /
dense-sparse internals are JVM-specific — the estimate cannot be
reproduced outside Spark, which fails this repo's differential-oracle
bar. These sketches trade a little accuracy theory for full portability:
every hash is md5-derived and every reduction is integer-exact, so the
SAME estimate falls out of any engine at any parallelism — and the
sketch itself becomes testable data rather than an opaque binary blob.

Two published estimators:

* **KMV (k-minimum values)** — Bar-Yossef et al. 2002: keep the k
  smallest normalized hashes; estimate ``(k-1) / h_(k)``. One
  ``TakeOrderedAndProject`` over distinct hashes — no register state.
* **HLL (HyperLogLog)** — Flajolet et al. 2007: ``m = 2^p`` registers,
  register = max trailing-zero rank. The harmonic-mean denominator is
  computed in SCALED INTEGERS (``2^(RANK_CAP - M_j)`` summed as BIGINT,
  exact), so the classic order-dependent float-sum nondeterminism of
  naive HLL implementations is gone by construction.

At 100 TB both are one partial-aggregated pass: HLL reduces to ``m``
register rows then 1; KMV's top-k merges k rows per partition. Use these
when the estimate must be auditable/reproducible; use Spark's built-in
``approx_count_distinct`` when raw speed matters and the value is only
advisory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 60-bit md5 hash recipe is shared with weighted sampling — one
# definition, one place to fix (functions/hashing.py)
from ..functions.hashing import md5_long60 as _h60

__all__ = [
    "kmv_distinct", "hll_distinct", "hll_registers", "hll_merge",
    "cms_registers", "cms_merge", "cms_lookup",
    "hist_registers", "hist_merge", "hist_quantiles",
    "hll_distinct_by",
]

#: ranks cap here so 2^(RANK_CAP - rank) sums stay far inside BIGINT
#: (m * 2^RANK_CAP <= 2^16 * 2^40 = 2^56); with a 54-bit hash remainder
#: ranks above 40 are astronomically rare and clip harmlessly
_RANK_CAP = 40


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct estimate. Output one row:
    ``(k, kth_hash, n_hashes, estimate)`` where ``estimate`` is
    ``(k-1) / (kth_hash / 2^60)`` when at least ``k`` distinct hashes
    exist, else ``n_hashes`` exactly (the sketch degenerates to an exact
    count below k — a feature, not a fallback).

    Plan: distinct hash values → ascending top-k
    (``TakeOrderedAndProject``: per-partition k-row heaps, k-row merge)
    → 1-row aggregate. The floor(x*1e4+0.5) rule rounds the estimate.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # nulls never hash: COUNT(DISTINCT col) semantics — and Spark sorts
    # null FIRST ascending while other engines sort it last, so a null
    # hash would nondeterministically occupy a top-k slot
    hashes = (
        df.filter(F.col(col).isNotNull())
        .select(_h60(F.col(col)).alias("__h"))
        .distinct()
    )
    topk = hashes.orderBy(F.col("__h").asc()).limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        F.max("__h").alias("kth_hash"),
    )
    full = F.lit(float(k - 1)) / (
        F.col("kth_hash").cast("double") / F.lit(float(1 << 60))
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        full
    )
    return agg.select(
        F.lit(k).cast("int").alias("k"),
        "kth_hash",
        "n_hashes",
        (F.floor(est * 10000 + 0.5).cast("double") / 10000.0).alias("estimate"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """Portable HyperLogLog distinct estimate with ``m = 2^p`` registers.
    Output one row: ``(m, n_empty_registers, estimate)``.

    Per row: 60-bit md5 hash → register ``h % m``, rank = trailing zeros
    of ``h // m`` plus 1 (capped). Registers aggregate with ``max``; the
    harmonic denominator sums ``2^(RANK_CAP - rank)`` as exact BIGINTs
    (absent registers contribute ``2^RANK_CAP``), so the whole sketch is
    integer-deterministic; the only float math is the final closed-form
    estimate. Small-range correction (linear counting) applies below
    ``2.5 m`` when empty registers exist, per the published algorithm.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    df = df.filter(F.col(col).isNotNull())  # see kmv_distinct: null never hashes
    h = _h60(F.col(col))
    # h // m and h % m as BIT ops (m is a power of two): exact at any
    # width — a double division would lose bits past 2^53 for small p
    w = F.shiftright(h, p)
    # trailing zeros via the isolate-lowest-set-bit identity
    tz = F.bit_count((w.bitwiseAND(-w)) - 1)
    rank = F.least(tz + 1, F.lit(_RANK_CAP))
    regs = df.select(
        h.bitwiseAND(m - 1).alias("__reg"), rank.alias("__rank")
    ).groupBy("__reg").agg(F.max("__rank").alias("__m"))
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        # 2^(CAP - rank) as a long: pow() of an integer exponent <= 40 is
        # IEEE-exact, and shiftleft() only takes a literal shift amount
        # coalesce: SUM over zero register rows is NULL, which would
        # poison the estimate on an empty/all-null input — the correct
        # empty-sketch answer is 0 present sum (=> linear counting => 0.0)
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), (F.lit(_RANK_CAP) - F.col("__m")).cast("double"))
                .cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    n_empty = F.lit(m).cast("long") - F.col("n_present")
    s_total = F.col("__s_present") + n_empty * F.lit(1 << _RANK_CAP).cast("long")
    denom = s_total.cast("double") / F.lit(float(1 << _RANK_CAP))
    raw = F.lit(alpha * m * m) / denom
    # linear counting below 2.5m with empty registers (Flajolet §4)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (n_empty > 0), lc).otherwise(raw)
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        n_empty.cast("long").alias("n_empty_registers"),
        (F.floor(est * 10000 + 0.5).cast("double") / 10000.0).alias("estimate"),
    )


def _expected_error(p: int) -> float:
    """Standard error bound 1.04/sqrt(m) — exposed for tests/docs."""
    return 1.04 / math.sqrt(1 << p)


def hll_registers(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """The MERGEABLE form of :func:`hll_distinct`: the register table
    ``(register, max_rank)`` (present registers only). Registers from
    disjoint corpora/partitions/days union with ``hll_merge`` — the
    property that makes HLL the sketch for incremental pipelines: keep
    yesterday's 2^p-row table, aggregate today's drop, merge, estimate —
    no rescan of history."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    df = df.filter(F.col(col).isNotNull())
    h = _h60(F.col(col))
    w = F.shiftright(h, p)
    tz = F.bit_count((w.bitwiseAND(-w)) - 1)
    rank = F.least(tz + 1, F.lit(_RANK_CAP))
    return (
        df.select(h.bitwiseAND(m - 1).alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").cast("int").alias("max_rank"))
    )


def hll_merge(*register_tables: DataFrame, p: int = 9) -> DataFrame:
    """Merge :func:`hll_registers` tables (same ``p``) and produce the
    1-row estimate with the same formula/corrections as
    :func:`hll_distinct`. Exact property: merging sketches of corpora
    equals sketching their union — pinned by test."""
    if not register_tables:
        raise ValueError("need at least one register table")
    m = 1 << p
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    regs = merged.groupBy("register").agg(F.max("max_rank").alias("__m"))
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        # coalesce: SUM over zero register rows is NULL, which would
        # poison the estimate on an empty/all-null input — the correct
        # empty-sketch answer is 0 present sum (=> linear counting => 0.0)
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), (F.lit(_RANK_CAP) - F.col("__m")).cast("double"))
                .cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    n_empty = F.lit(m).cast("long") - F.col("n_present")
    s_total = F.col("__s_present") + n_empty * F.lit(1 << _RANK_CAP).cast("long")
    denom = s_total.cast("double") / F.lit(float(1 << _RANK_CAP))
    raw = F.lit(alpha * m * m) / denom
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (n_empty > 0), lc).otherwise(raw)
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        n_empty.cast("long").alias("n_empty_registers"),
        (F.floor(est * 10000 + 0.5).cast("double") / 10000.0).alias("estimate"),
    )


def cms_registers(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch register table ``(sketch_row, slot, cnt)`` —
    the MERGEABLE frequency sketch: disjoint corpora's tables union-sum
    with :func:`cms_merge`, and any key's frequency is over-estimated by
    at most ``e·N/width`` with probability ``1 - e^-depth`` (classic CM
    guarantee; estimates NEVER under-count).

    Each row r of the sketch hashes the key through an independent
    function (the shared md5 recipe, seeded by prefixing ``r:``), so one
    explode + one hash aggregate builds all ``depth`` rows in a single
    pass — at most ``depth × width`` output rows regardless of input
    size. ``weight_col`` turns it into a weighted frequency sketch
    (weights must be non-negative for the no-undercount guarantee)."""
    if depth < 1 or width < 2:
        raise ValueError("cms_registers: need depth >= 1 and width >= 2")
    d = df.filter(F.col(col).isNotNull())
    # round-half-up, not cast('long'): a truncating cast maps weight 0.9
    # to 0, silently breaking the no-undercount guarantee for fractional
    # weight columns; sketch counts are integral, so snap per row (pre-
    # scale to micro-units yourself if sub-integral precision matters)
    w = (
        F.floor(F.col(weight_col).cast("double") + F.lit(0.5)).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("sketch_row")
    seeded = F.concat(
        F.col("sketch_row").cast("string"), F.lit(":"), F.col(col).cast("string")
    )
    return (
        d.select(F.col(col), w.alias("__w"))
        .select("*", rows)
        .select(
            F.col("sketch_row"),
            (_h60(seeded) % width).cast("int").alias("slot"),
            F.col("__w"),
        )
        .groupBy("sketch_row", "slot")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(*register_tables: DataFrame) -> DataFrame:
    """Union-sum count-min tables built with identical (depth, width):
    merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B) exactly — pinned by
    test. One key-pair aggregate over at most depth×width rows/input."""
    if not register_tables:
        raise ValueError("cms_merge: need at least one register table")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return (
        merged.groupBy("sketch_row", "slot")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_lookup(
    registers: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys[col]``: the
    estimate is the MIN over the ``depth`` hashed slots (a missing slot
    means the key was never seen → 0). The register table is at most
    depth×width rows, so the probe is a broadcast hash join however big
    the key list is."""
    from pyspark.sql.functions import broadcast

    k = keys.select(col).filter(F.col(col).isNotNull()).distinct()
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("sketch_row")
    seeded = F.concat(
        F.col("sketch_row").cast("string"), F.lit(":"), F.col(col).cast("string")
    )
    probes = k.select("*", rows).select(
        F.col(col),
        F.col("sketch_row"),
        (_h60(seeded) % width).cast("int").alias("slot"),
    )
    return (
        probes.join(broadcast(registers), ["sketch_row", "slot"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )


def hist_registers(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    buckets: int = 1024,
) -> DataFrame:
    """Fixed-width histogram register table ``(bucket, cnt)`` over a
    declared domain — the MERGEABLE quantile sketch: disjoint corpora's
    tables union-sum with :func:`hist_merge`, and any quantile reads off
    the cumulative histogram with error ≤ one bucket width. At most
    ``buckets`` output rows from ONE hash aggregate, however big the
    input; values outside [lo, hi) clamp to the edge buckets (count
    them, never drop them — quantiles of the clamped distribution are
    still upper/lower bounds for the true ones).

    The bucket function is an IEEE-exact affine floor (same contract as
    sources.layout.quantize), so every engine buckets identically."""
    if hi <= lo:
        raise ValueError("hist_registers: need hi > lo")
    if buckets < 1:
        raise ValueError("hist_registers: need buckets >= 1")
    x = F.col(col).cast("double")
    raw = F.floor((x - lo) / (hi - lo) * buckets).cast("long")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(*register_tables: DataFrame) -> DataFrame:
    """Union-sum histogram tables built with identical (lo, hi, buckets):
    merge(hist(A), hist(B)) ≡ hist(A ∪ B) exactly."""
    if not register_tables:
        raise ValueError("hist_merge: need at least one register table")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))


def hist_quantiles(
    registers: DataFrame,
    qs: list,
    *,
    lo: float,
    hi: float,
    buckets: int = 1024,
) -> DataFrame:
    """Read quantile estimates off a histogram register table: for each
    ``q`` the answer is the UPPER EDGE of the first bucket whose
    cumulative count reaches ``ceil(q · total)`` — deterministic (no
    interpolation), within one bucket width of the true quantile.

    Plan shape: the register table is ≤ ``buckets`` rows, so the window
    cumsum and the |qs|×|buckets| probe are driver-trivial relational
    work — no pass over the original data."""
    from pyspark.sql import Window

    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("hist_quantiles: each q must be in (0, 1]")
    # registers feeds BOTH the cumsum window and the total aggregate —
    # truncate once or Catalyst replays whatever pipeline BUILT the
    # register table (usually a full-corpus sketch) per branch
    registers = registers.localCheckpoint(eager=False)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = registers.select(
        "bucket", F.sum("cnt").over(w).cast("long").alias("cum")
    )
    total = registers.agg(F.sum("cnt").cast("long").alias("total"))
    qdf = registers.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    width = (hi - lo) / buckets
    target = F.ceil(F.col("q") * F.col("total")).cast("long")
    return (
        qdf.crossJoin(F.broadcast(total))
        .join(F.broadcast(cum), cum["cum"] >= target, "inner")
        .groupBy("q")
        .agg(F.min("bucket").alias("__b"))
        .select(
            "q",
            (F.lit(lo) + (F.col("__b") + 1).cast("double") * F.lit(width)).alias(
                "est_value"
            ),
        )
    )


def hll_distinct_by(
    df: DataFrame, keys, col: str, p: int = 9
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate — the scalable
    ``GROUP BY k, COUNT(DISTINCT col)`` replacement: exact distinct
    needs a (key, value) exchange proportional to the DATA; this needs
    one (key, register) aggregate whose output is ≤ |keys| · 2^p rows
    however many values each key holds.

    Output ``(keys…, n_empty_registers, estimate)`` with the identical
    hash/register/rank/correction pipeline as :func:`hll_distinct`
    (integer-deterministic registers; the only float math is the final
    closed-form estimate, snapped to basis points)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    if isinstance(keys, str):
        keys = [keys]
    m = 1 << p
    d = df.filter(F.col(col).isNotNull())
    h = _h60(F.col(col))
    w = F.shiftright(h, p)
    tz = F.bit_count((w.bitwiseAND(-w)) - 1)
    rank = F.least(tz + 1, F.lit(_RANK_CAP))
    regs = (
        d.select(*keys, h.bitwiseAND(m - 1).alias("__reg"), rank.alias("__rank"))
        .groupBy(*keys, "__reg")
        .agg(F.max("__rank").alias("__m"))
    )
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        # coalesce: SUM over zero register rows is NULL, which would
        # poison the estimate on an empty/all-null input — the correct
        # empty-sketch answer is 0 present sum (=> linear counting => 0.0)
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), (F.lit(_RANK_CAP) - F.col("__m")).cast("double"))
                .cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    n_empty = F.lit(m).cast("long") - F.col("n_present")
    s_total = F.col("__s_present") + n_empty * F.lit(1 << _RANK_CAP).cast("long")
    denom = s_total.cast("double") / F.lit(float(1 << _RANK_CAP))
    raw = F.lit(alpha * m * m) / denom
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (n_empty > 0), lc).otherwise(raw)
    return agg.select(
        *keys,
        n_empty.cast("long").alias("n_empty_registers"),
        (F.floor(est * 10000 + 0.5).cast("double") / 10000.0).alias("estimate"),
    )


def hist_registers_by(
    df: DataFrame,
    keys,
    col: str,
    *,
    lo: float,
    hi: float,
    buckets: int = 1024,
) -> DataFrame:
    """Per-group histogram register table ``(keys…, bucket, cnt)`` — the
    grouped quantile sketch: the scalable replacement for
    ``GROUP BY k, percentile(col, q)``, whose exact form needs a
    per-group SORT of the data. This needs ONE hash aggregate whose
    output is ≤ |keys|·buckets rows however many values each key holds;
    disjoint corpora's tables union-sum with :func:`hist_merge_by`.
    Identical IEEE-exact affine bucketing as :func:`hist_registers`."""
    if hi <= lo:
        raise ValueError("hist_registers_by: need hi > lo")
    if buckets < 1:
        raise ValueError("hist_registers_by: need buckets >= 1")
    if isinstance(keys, str):
        keys = [keys]
    x = F.col(col).cast("double")
    raw = F.floor((x - lo) / (hi - lo) * buckets).cast("long")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, b.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge_by(keys, *register_tables: DataFrame) -> DataFrame:
    """Union-sum per-group histogram tables built with identical
    (lo, hi, buckets): merge ≡ sketch of the union, per group."""
    if isinstance(keys, str):
        keys = [keys]
    if not register_tables:
        raise ValueError("hist_merge_by: need at least one register table")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy(*keys, "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def hist_quantiles_by(
    registers: DataFrame,
    keys,
    qs: list,
    *,
    lo: float,
    hi: float,
    buckets: int = 1024,
) -> DataFrame:
    """Per-group quantile readout: for each group and each ``q`` the
    UPPER EDGE of the first bucket whose within-group cumulative count
    reaches ``ceil(q · group_total)`` — the same deterministic rule as
    :func:`hist_quantiles`, partitioned. Register relation is ≤
    |keys|·buckets rows, so the window cumsum, the per-group total, and
    the |qs|-way probe are all sketch-sized work — no pass over the
    original data, and the probe join keys on the GROUP (equi-join, not
    a cross join)."""
    from pyspark.sql import Window

    if isinstance(keys, str):
        keys = [keys]
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("hist_quantiles_by: each q must be in (0, 1]")
    registers = registers.localCheckpoint(eager=False)
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = registers.select(
        *keys, "bucket", F.sum("cnt").over(w).cast("long").alias("cum")
    )
    total = registers.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("total"))
    qdf = registers.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    width = (hi - lo) / buckets
    target = F.ceil(F.col("q") * F.col("total")).cast("long")
    probes = total.crossJoin(F.broadcast(qdf)).select(*keys, "q", target.alias("__t"))
    return (
        probes.join(F.broadcast(cum), [*keys], "inner")
        .filter(F.col("cum") >= F.col("__t"))
        .groupBy(*keys, "q")
        .agg(F.min("bucket").alias("__b"))
        .select(
            *keys,
            "q",
            (F.lit(lo) + (F.col("__b") + 1).cast("double") * F.lit(width)).alias(
                "est_value"
            ),
        )
    )
