"""Skew mitigation for pathological subjects (ARCHITECTURE.md §Skew).

The engine's kernels hash-partition by ``subject_id``; a subject with ~10⁶+
events serializes inside one task. These operators break that subject into
TIME chunks — chunk assignment is a pure row-local expression
(``floor(unix_micros(ts) / chunk)``), so no serialized pass is needed to
split — and restore exactness in one of two ways:

* :func:`chunked_cumsum` — per-subject running sums computed as intra-chunk
  cumsums (parallel across chunks) plus a stitched per-chunk exclusive
  prefix: chunk totals are a tiny side-relation (one row per (subject,
  chunk)), prefix-summed with a window over chunks and broadcast-joined
  back. Two extra small shuffles, full parallelism across chunks.
* :func:`aggregate_temporal_window_chunked` — the temporal kernel
  (``aggregate.py::aggregate_temporal_window``) with halo replication: each
  row is exploded into every chunk whose windows can reach it (≤ 1 +
  ⌈frame_span/chunk⌉ copies, so ~2-3× with ``chunk ≥ span``), the range
  frame runs within ``(subject_id, chunk)`` — parallel across chunks — and
  only each row's home-chunk copy is emitted. Bit-identical to the
  unchunked kernel (pinned by a differential test).

These are OPT-IN variants: for EHR-shaped data (≤ ~100k events/subject)
the plain kernels' single exchange wins; switch when a corpus has
documented hot keys (``tools/skew_probe.py`` measures the crossover).
Precondition (same as the kernels): ``(subject_id, timestamp)`` unique,
timestamps non-null.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..types import PRED_CNT_TYPE, TemporalWindowBounds, td_to_us

_US_PER_DAY = 86_400_000_000


def _repartition_chunked(df: DataFrame, key: str) -> DataFrame:
    """Pin an EXPLICIT exchange on ``(key, __chunk)`` before the chunked
    window. Without the explicit partition count, AQE coalesces the fresh
    shuffle down to advisory-size partitions (~64 MB), which re-serializes
    exactly the work the chunking exists to spread — measured 5× slower on
    the 1M-event hot-subject probe."""
    spark = df.sparkSession
    num = max(
        df.rdd.getNumPartitions(),
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return df.repartition(num, key, "__chunk")


def chunked_cumsum(
    df: DataFrame,
    value_cols: list[str] | None = None,
    chunk: timedelta = timedelta(days=365),
    key: str = "subject_id",
    ts: str = "timestamp",
    prefix: str = "cum_",
) -> DataFrame:
    """Exact per-``key`` running cumulative sums with intra-chunk
    parallelism: adds ``{prefix}{col}`` columns equal to
    ``sum(col) over (partition by key order by ts rows unbounded preceding
    to current row)`` without ever materializing one key's full history in
    a single task's window frame.

    Stitching: chunk c's rows see their intra-chunk cumsum plus the sum of
    all earlier chunks — an exclusive prefix over the per-chunk totals,
    which is |keys|×|chunks| rows (tiny) and broadcast back.
    """
    cols = value_cols if value_cols is not None else [
        c for c in df.columns if c not in (key, ts)
    ]
    chunk_us = td_to_us(chunk)
    cid = F.floor(F.unix_micros(F.col(ts)) / F.lit(chunk_us)).alias("__chunk")
    data = _repartition_chunked(df.select("*", cid), key)

    w_intra = (
        Window.partitionBy(key, "__chunk")
        .orderBy(F.col(ts).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = data.withColumns({f"__intra_{c}": F.sum(F.col(c)).over(w_intra) for c in cols})

    totals = data.groupBy(key, "__chunk").agg(
        *[F.sum(F.col(c)).alias(f"__tot_{c}") for c in cols]
    )
    w_prev = (
        Window.partitionBy(key)
        .orderBy(F.col("__chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        key,
        "__chunk",
        *[
            F.coalesce(F.sum(F.col(f"__tot_{c}")).over(w_prev), F.lit(0)).alias(f"__pre_{c}")
            for c in cols
        ],
    )

    joined = intra.join(F.broadcast(prefixes), on=[key, "__chunk"])
    out_cols = {
        f"{prefix}{c}": (F.col(f"__intra_{c}") + F.col(f"__pre_{c}")).cast(PRED_CNT_TYPE)
        for c in cols
    }
    return joined.withColumns(out_cols).drop(
        "__chunk", *[f"__intra_{c}" for c in cols], *[f"__pre_{c}" for c in cols]
    )


def aggregate_temporal_window_chunked(
    predicates_df: DataFrame,
    endpoint_expr: TemporalWindowBounds | tuple,
    chunk: timedelta | None = None,
) -> DataFrame:
    """Skew-resistant :func:`~aces_spark.operators.aggregate.aggregate_temporal_window`:
    identical output, but the range-frame window runs within
    ``(subject_id, time-chunk)`` so a hot subject's events spread across
    ``span(subject)/chunk`` parallel tasks instead of one.

    Exactness via halo replication: a context row at ``ts`` can be read by
    rows in chunks ``chunk_of(ts - hi) .. chunk_of(ts - lo)`` (the frame is
    ``[row + lo, row + hi]`` μs); the row is exploded into exactly those
    chunks, every chunk evaluates a complete frame locally, and only the
    home-chunk copy (``__chunk == chunk_of(ts)``) is emitted.

    ``chunk`` defaults to ``4 × frame span`` (≥ 1 day), bounding halo
    duplication at ~25% while still splitting multi-year hot subjects.
    """
    if not isinstance(endpoint_expr, TemporalWindowBounds):
        endpoint_expr = TemporalWindowBounds(*endpoint_expr)
    lo, hi = endpoint_expr.spark_range_bounds
    pred_cols = [c for c in predicates_df.columns if c not in ("subject_id", "timestamp")]
    ts_us = F.unix_micros(F.col("timestamp"))
    off_us = td_to_us(endpoint_expr.offset)
    ws_us = td_to_us(endpoint_expr.window_size)

    bound_cols = [
        F.timestamp_micros(ts_us + off_us).alias("timestamp_at_start"),
        F.timestamp_micros(ts_us + off_us + ws_us).alias("timestamp_at_end"),
    ]

    if lo > hi:  # degenerate empty frame — same shortcut as the plain kernel
        return predicates_df.select(
            "subject_id",
            "timestamp",
            *bound_cols,
            *[F.lit(0).cast(PRED_CNT_TYPE).alias(c) for c in pred_cols],
        )

    if chunk is None:
        chunk_us = max(4 * (hi - lo), _US_PER_DAY)
    else:
        chunk_us = td_to_us(chunk)

    home = F.floor(ts_us / F.lit(chunk_us))
    # the home chunk is folded in even when the frame excludes the row
    # itself (pure-offset frames with lo > 0 or hi < 0) — every row must
    # still be EMITTED from its home copy
    first_target = F.least(home, F.floor((ts_us - F.lit(hi)) / F.lit(chunk_us)))
    last_target = F.greatest(home, F.floor((ts_us - F.lit(lo)) / F.lit(chunk_us)))
    exploded = _repartition_chunked(
        predicates_df.select(
            "*",
            home.alias("__home"),
            F.explode(F.sequence(first_target, last_target)).alias("__chunk"),
        ),
        "subject_id",
    )

    w = (
        Window.partitionBy("subject_id", "__chunk")
        .orderBy(ts_us.asc())
        .rangeBetween(lo, hi)
    )
    summed = exploded.select(
        "*",
        *[
            F.coalesce(F.sum(F.col(c)).over(w), F.lit(0))
            .cast(PRED_CNT_TYPE)
            .alias(f"__sum_{c}")
            for c in pred_cols
        ],
    ).filter(F.col("__chunk") == F.col("__home"))

    return summed.select(
        "subject_id",
        "timestamp",
        *bound_cols,
        *[F.col(f"__sum_{c}").alias(c) for c in pred_cols],
    )
