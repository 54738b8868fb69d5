"""Incremental aggregate maintenance: keep a small per-key PARTIAL-STATE
table, fold each new batch's partials into it, and finalize without ever
rescanning history.

This is how a 100 TB rollup stays cheap: the full corpus is touched once
(its partial state is a |keys|-row table); every subsequent drop only
scans its own rows, computes the same partial state, and merges by key —
a broadcast-sized or at worst keys-partitioned groupBy. The invariant
that makes it safe is algebraic: every statistic kept is a commutative
monoid (count-sum / sum / min / max), so

    merge(partial(history), partial(delta)) == partial(history ∪ delta)

bit-for-bit — pinned by the oracle row (`incr_agg_merge` merges two
halves of events and must hash-match a single full-table aggregate) and
by a pytest differential on random splits.

Determinism contract: value sums snap to integer micro-units per row
(``floor(value·1e6 + 0.5)`` as BIGINT) *before* any aggregation, the
same rule as datapipe.lm — integer sums are order-independent and
engine-exact, so re-partitioning, merge order, and engine choice cannot
move the result. The finalized mean divides the exact integer sum by the
exact count (IEEE double division of exact integers: deterministic) and
snaps back to micro-units.

State schema: ``keys…, n BIGINT, sum_u BIGINT, min_v DOUBLE, max_v
DOUBLE``. Null values contribute to no statistic (n counts non-null
values, matching SQL aggregate semantics).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def partial_stats(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One batch's partial state: per-key (n, sum_u, min_v, max_v) over
    ``value_col``, micro-unit-exact. One hash aggregate (map-side
    partials combine before the keys exchange)."""
    vu = F.floor(F.col(value_col) * MICRO + F.lit(0.5)).cast("long")
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.coalesce(F.sum(vu), F.lit(0)).cast("long").alias("sum_u"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_partials(states: Sequence[DataFrame]) -> DataFrame:
    """Fold any number of partial-state tables into one: union + one
    keys-keyed aggregate. Associative and commutative, so states can be
    merged pairwise, hierarchically, or all at once — same result."""
    if not states:
        raise ValueError("merge_partials: need at least one state table")
    keys = [c for c in states[0].columns if c not in ("n", "sum_u", "min_v", "max_v")]
    u = reduce(DataFrame.unionByName, states)
    return u.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_u").cast("long").alias("sum_u"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_stats(state: DataFrame) -> DataFrame:
    """Human-facing view of a state table: n, micro-exact mean, min, max.
    ``mean`` = round-half-up(sum_u / n) micro-units — both the division
    (IEEE on exact integers) and the snap are engine-exact."""
    keys = [c for c in state.columns if c not in ("n", "sum_u", "min_v", "max_v")]
    # n = 0 (a key whose values were all null) finalizes to a null mean,
    # not an ANSI divide-by-zero
    mean_u = F.when(
        F.col("n") > 0,
        F.floor(F.col("sum_u").cast("double") / F.col("n") + F.lit(0.5)),
    )
    return state.select(
        *keys,
        F.col("n"),
        (mean_u.cast("double") / MICRO).alias("mean_v"),
        "min_v",
        "max_v",
    )


def incremental_stats(
    history: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """The end-to-end incremental shape: partial(history) ⊕
    partial(delta), finalized. In production ``partial_stats(history)``
    is a table read back from the lake, not recomputed."""
    merged = merge_partials(
        [partial_stats(history, keys, value_col), partial_stats(delta, keys, value_col)]
    )
    return finalize_stats(merged)
