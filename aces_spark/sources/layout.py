"""Z-order (Morton) data layout: interleave the bits of several integer
dimensions into one sort key so that sorting by it co-locates rows that
are close in EVERY dimension at once.

Why it matters at 100 TB: parquet row-group min/max statistics prune on
the SORT order. A table sorted by (a) skips beautifully on `a` and not
at all on `b`; a Z-ordered sort gives every dimension row-groups whose
min/max span ~2^(bits/n) of its range, so selective filters on ANY of
the interleaved columns skip most of the file. This is the same layout
Delta/Iceberg `OPTIMIZE ZORDER BY` produces; here it is a plain column
expression + `repartitionByRange`, so it works on any parquet sink.

The key is pure bit arithmetic on BIGINTs (shift/and/or), entirely
inside whole-stage codegen and exactly mirrorable in any SQL engine —
no UDF, no driver work. Inputs must already be non-negative integers
below 2^bits; use `quantize` for doubles or wider ints (linear min/max
scaling is intentionally NOT built in: it would need a data pass —
callers at scale know their domains).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) by fixed linear scaling
    (values clamped to the declared domain). Deterministic: floor of an
    IEEE-exact affine map."""
    if hi <= lo:
        raise ValueError("quantize: need hi > lo")
    cells = (1 << bits) - 1
    x = F.least(F.greatest(col.cast("double"), F.lit(float(lo))), F.lit(float(hi)))
    return F.floor((x - lo) / (hi - lo) * cells + 0.5).cast("long")


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (each a non-negative BIGINT < 2^bits)
    into one BIGINT: bit b of column i lands at position b*n + i. Total
    bits n*bits must fit a signed 64-bit long."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key: need at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"zorder_key: {n}*{bits} interleaved bits overflow a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[Column],
    *,
    bits: int = 16,
    num_files: int = 32,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional skipping: range-partition by
    the Z key into ``num_files`` splits and sort within each — one range
    exchange (with Spark's built-in sampling), then a local sort; write
    the result with any parquet sink and every file's min/max stats are
    tight in every interleaved dimension."""
    z = zorder_key(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    return (
        out.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_bucket_stats(
    df: DataFrame,
    cols: Sequence[Column],
    names: Sequence[str],
    *,
    bits: int = 8,
    bucket_shift: int = 10,
) -> DataFrame:
    """Layout diagnostic: bucket the Z key (``z div 2^bucket_shift`` ≈ a
    row-group) and report each bucket's per-dimension min/max — tight
    ranges in every column are the data-skipping guarantee made visible.
    One hash aggregate."""
    if len(cols) != len(names):
        raise ValueError("zorder_bucket_stats: cols and names must align")
    dims = [c.alias(f"__d_{nm}") for c, nm in zip(cols, names)]
    base = df.select(*dims).select(
        F.shiftright(
            zorder_key([F.col(f"__d_{nm}") for nm in names], bits), bucket_shift
        ).alias("z_bucket"),
        *[F.col(f"__d_{nm}") for nm in names],
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for nm in names:
        aggs.append(F.min(f"__d_{nm}").alias(f"min_{nm}"))
        aggs.append(F.max(f"__d_{nm}").alias(f"max_{nm}"))
    return base.groupBy("z_bucket").agg(*aggs)
