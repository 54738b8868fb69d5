"""Skew-mitigation operators: chunked cumsum / halo-chunked temporal kernel
must be BIT-IDENTICAL to the plain per-subject formulations (differential),
while actually splitting a subject across chunks (plan property).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aces_spark import TemporalWindowBounds, aggregate_temporal_window
from aces_spark.operators.skew import aggregate_temporal_window_chunked, chunked_cumsum


def _rows(seed: int, n_subjects: int = 3, max_rows: int = 60):
    rng = random.Random(seed)
    base = datetime(2020, 1, 1)
    rows = []
    for sid in range(1, n_subjects + 1):
        times = sorted(rng.sample(range(0, 50_000), rng.randint(5, max_rows)))
        for m in times:
            rows.append((sid, base + timedelta(minutes=m), rng.randint(0, 3), rng.randint(0, 1)))
    return rows


def _key(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunked_cumsum_matches_plain(spark):
    rows = _rows(5)
    df = spark.createDataFrame(rows, "subject_id long, timestamp timestamp, p1 long, p2 long")
    w = (
        Window.partitionBy("subject_id")
        .orderBy(F.col("timestamp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = df.select(
        "subject_id",
        "timestamp",
        F.sum("p1").over(w).cast("long").alias("cum_p1"),
        F.sum("p2").over(w).cast("long").alias("cum_p2"),
    )
    # tiny chunk (2h over a ~35-day span) → many chunks per subject
    chunked = chunked_cumsum(df, ["p1", "p2"], chunk=timedelta(hours=2)).select(
        "subject_id", "timestamp", "cum_p1", "cum_p2"
    )
    assert _key(chunked) == _key(plain)


BOUNDS = [
    TemporalWindowBounds(True, timedelta(hours=10), True, None),
    TemporalWindowBounds(False, timedelta(hours=10), False, None),
    TemporalWindowBounds(True, timedelta(hours=-10), False, None),
    TemporalWindowBounds(False, timedelta(hours=6), True, timedelta(hours=3)),
    TemporalWindowBounds(True, timedelta(hours=-6), True, timedelta(hours=-3)),
    TemporalWindowBounds(True, timedelta(hours=2), True, timedelta(hours=30)),  # pure-offset reach
]


@pytest.mark.parametrize(
    "bounds",
    BOUNDS,
    ids=lambda b: f"li{b.left_inclusive}-ws{b.window_size}-ri{b.right_inclusive}-off{b.offset}",
)
def test_chunked_temporal_kernel_differential(spark, bounds):
    rows = _rows(11)
    df = spark.createDataFrame(rows, "subject_id long, timestamp timestamp, p1 long, p2 long")
    plain = aggregate_temporal_window(df, bounds)
    # chunk barely above the frame span → maximal halo stress
    chunked = aggregate_temporal_window_chunked(df, bounds, chunk=timedelta(hours=11))
    assert chunked.columns == plain.columns
    assert _key(chunked) == _key(plain)


def test_chunked_temporal_kernel_default_chunk(spark):
    rows = _rows(13)
    df = spark.createDataFrame(rows, "subject_id long, timestamp timestamp, p1 long, p2 long")
    bounds = TemporalWindowBounds(True, timedelta(hours=5), False, None)
    assert _key(aggregate_temporal_window_chunked(df, bounds)) == _key(
        aggregate_temporal_window(df, bounds)
    )


def test_chunked_kernel_actually_chunks(spark):
    """The physical plan must partition the window by (subject_id, chunk),
    not subject_id alone — otherwise the operator silently degrades to the
    serialized formulation."""
    rows = _rows(17)
    df = spark.createDataFrame(rows, "subject_id long, timestamp timestamp, p1 long, p2 long")
    out = aggregate_temporal_window_chunked(
        df, TemporalWindowBounds(True, timedelta(hours=10), True, None), chunk=timedelta(hours=12)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


# ---------------- chunked event-bound kernel ----------------

from aces_spark.operators.aggregate import boolean_expr_bound_sum  # noqa: E402
from aces_spark.operators.skew import (  # noqa: E402
    aggregate_event_bound_window_chunked,
    boolean_expr_bound_sum_chunked,
)


def _eb_rows(seed: int, n_subjects: int = 3, max_rows: int = 60):
    """Rows with a sparse boundary predicate column ``b``."""
    rng = random.Random(seed)
    base = datetime(2020, 1, 1)
    rows = []
    for sid in range(1, n_subjects + 1):
        times = sorted(rng.sample(range(0, 50_000), rng.randint(5, max_rows)))
        for m in times:
            rows.append(
                (
                    sid,
                    base + timedelta(minutes=m),
                    rng.randint(0, 3),
                    1 if rng.random() < 0.15 else 0,
                )
            )
    return rows


EB_SCHEMA = "subject_id long, timestamp timestamp, p1 long, b long"


@pytest.mark.parametrize("mode", ["bound_to_row", "row_to_bound"])
@pytest.mark.parametrize("closed", ["both", "none", "left", "right"])
@pytest.mark.parametrize(
    "offset", [timedelta(0), timedelta(hours=3), timedelta(hours=-3)], ids=["off0", "off+", "off-"]
)
def test_chunked_event_bound_differential(spark, mode, closed, offset):
    """Bit-identical to the plain kernel over the full mode×closed×offset
    grid, with a chunk (2h) far smaller than the data span so every stage
    crosses many chunk borders."""
    df = spark.createDataFrame(_eb_rows(23), EB_SCHEMA)
    plain = boolean_expr_bound_sum(df, ("col", "b"), mode, closed, offset)
    chunked = boolean_expr_bound_sum_chunked(
        df, ("col", "b"), mode, closed, offset, chunk=timedelta(hours=2)
    )
    assert chunked.columns == plain.columns
    assert _key(chunked) == _key(plain)


@pytest.mark.parametrize("end_event", ["-_RECORD_START", "_RECORD_END"])
def test_chunked_event_bound_record_bounds(spark, end_event):
    """Record start/end pseudo-boundaries resolve via groupBy+join (not a
    whole-partition window) and still match the plain kernel."""
    from aces_spark import ToEventWindowBounds, aggregate_event_bound_window

    df = spark.createDataFrame(_eb_rows(29), EB_SCHEMA)
    bounds = ToEventWindowBounds(True, end_event, True, None)
    plain = aggregate_event_bound_window(df, bounds)
    chunked = aggregate_event_bound_window_chunked(df, bounds, chunk=timedelta(hours=6))
    assert chunked.columns == plain.columns
    assert _key(chunked) == _key(plain)


def test_chunked_event_bound_no_boundary_subject(spark):
    """A subject with zero qualifying boundaries gets null window
    timestamps / zero counts from both formulations — and the carry from
    OTHER subjects must not leak across subject partitions."""
    base = datetime(2020, 1, 1)
    rows = [
        (1, base + timedelta(hours=1), 2, 1),
        (1, base + timedelta(hours=30), 1, 0),
        (2, base + timedelta(hours=2), 3, 0),  # no boundary at all
        (2, base + timedelta(hours=40), 1, 0),
    ]
    df = spark.createDataFrame(rows, EB_SCHEMA)
    for mode in ("bound_to_row", "row_to_bound"):
        plain = boolean_expr_bound_sum(df, ("col", "b"), mode, "both")
        chunked = boolean_expr_bound_sum_chunked(
            df, ("col", "b"), mode, "both", chunk=timedelta(hours=2)
        )
        assert _key(chunked) == _key(plain)


def test_chunked_event_bound_actually_chunks(spark):
    df = spark.createDataFrame(_eb_rows(31), EB_SCHEMA)
    out = boolean_expr_bound_sum_chunked(
        df, ("col", "b"), "row_to_bound", "both", chunk=timedelta(hours=2)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark):
        from aces_spark.operators.skew import salted_join

        left = spark.createDataFrame(
            [(i, i % 3, f"l{i}") for i in range(200)], "rid long, k long, lv string"
        )
        right = spark.createDataFrame(
            [(k, f"r{k}{j}") for k in range(3) for j in range(2)], "k long, rv string"
        )
        got = sorted(
            map(tuple, salted_join(left, right, "k", salt_key="rid").select(
                "rid", "k", "lv", "rv").collect())
        )
        want = sorted(
            map(tuple, left.join(right, "k").select("rid", "k", "lv", "rv").collect())
        )
        assert got == want

    def test_left_join_keeps_unmatched(self, spark):
        from aces_spark.operators.skew import salted_join

        left = spark.createDataFrame([(1, 10), (2, 99)], "rid long, k long")
        right = spark.createDataFrame([(10, "hit")], "k long, rv string")
        got = {
            r["rid"]: r["rv"]
            for r in salted_join(left, right, "k", salt_key="rid", how="left").collect()
        }
        assert got == {1: "hit", 2: None}

    def test_salts_spread_hot_key(self, spark):
        from aces_spark.operators.skew import salted_join
        from pyspark.sql import functions as F2

        left = spark.createDataFrame(
            [(i, 0) for i in range(1000)], "rid long, k long"
        )  # one hot key
        l = left.withColumn(
            "__salt", F2.pmod(F2.xxhash64(F2.col("rid")), F2.lit(8)).cast("int")
        )
        n_salts_seen = l.select("__salt").distinct().count()
        assert n_salts_seen == 8  # the hot key scatters across all salts

    def test_unsupported_how_rejected(self, spark):
        from aces_spark.operators.skew import salted_join

        df = spark.createDataFrame([(1, 1)], "rid long, k long")
        import pytest as _pt

        with _pt.raises(ValueError):
            salted_join(df, df, "k", salt_key="rid", how="full_outer")
