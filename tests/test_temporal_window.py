"""Temporal kernel tests: brute-force differential oracle + property test.

Mirrors the reference's strategy (``tests/test_aggregate_hypothesis.py``):
re-verify ``aggregate_temporal_window`` against a per-row filter-and-sum
oracle for every closedness × offset × window-direction combination.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from aces_spark import TemporalWindowBounds, aggregate_temporal_window
from tests.conftest import as_sorted_pdf


def brute_force(rows, bounds: TemporalWindowBounds):
    """Oracle: for each row, sum predicates over the closed/open interval
    [ts+offset+min(ws,0), ts+offset+max(ws,0)] per inclusivities."""
    out = []
    ws, off = bounds.window_size, bounds.offset
    for sid, t, *vals in rows:
        lo = t + off + min(ws, timedelta(0))
        hi = t + off + max(ws, timedelta(0))
        acc = [0] * len(vals)
        for sid2, t2, *vals2 in rows:
            if sid2 != sid:
                continue
            lo_ok = (t2 >= lo) if bounds.left_inclusive else (t2 > lo)
            hi_ok = (t2 <= hi) if bounds.right_inclusive else (t2 < hi)
            if lo_ok and hi_ok:
                acc = [a + v for a, v in zip(acc, vals2)]
        out.append((sid, t, t + off, t + off + ws, *acc))
    return out


def _mk_rows(seed: int, n_subjects=3, max_rows=25):
    rng = random.Random(seed)
    rows = []
    base = datetime(2020, 1, 1)
    for sid in range(1, n_subjects + 1):
        times = sorted(rng.sample(range(0, 10_000), rng.randint(1, max_rows)))
        for m in times:
            rows.append((sid, base + timedelta(minutes=m), rng.randint(0, 3), rng.randint(0, 1)))
    return rows


BOUND_GRID = [
    TemporalWindowBounds(li, timedelta(minutes=ws), ri, timedelta(minutes=off))
    for li in (True, False)
    for ri in (True, False)
    for ws in (60, -60, 1, 0)
    for off in (0, 30, -30)
    if not (ws == 0 and not (li and ri))  # zero window with open endpoint: degenerate, tested separately
]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bounds", BOUND_GRID, ids=lambda b: f"li{b.left_inclusive}-ri{b.right_inclusive}-ws{b.window_size}-off{b.offset}")
def test_temporal_window_vs_brute_force(spark, seed, bounds):
    rows = _mk_rows(seed)
    df = spark.createDataFrame(
        rows, "subject_id long, timestamp timestamp, p1 long, p2 long"
    )
    out = aggregate_temporal_window(df, bounds)
    got = as_sorted_pdf(out, ["subject_id", "timestamp"])
    expected = sorted(brute_force(rows, bounds))
    assert len(got) == len(expected)
    for i, exp in enumerate(expected):
        sid, t, st, end, p1, p2 = exp
        assert got.loc[i, "subject_id"] == sid
        assert got.loc[i, "timestamp"].to_pydatetime() == t
        assert got.loc[i, "timestamp_at_start"].to_pydatetime() == st
        assert got.loc[i, "timestamp_at_end"].to_pydatetime() == end
        assert got.loc[i, "p1"] == p1, f"row {i}: p1 {got.loc[i, 'p1']} != {p1}"
        assert got.loc[i, "p2"] == p2


def test_degenerate_open_zero_window(spark):
    """Zero-length window with an open endpoint sums nothing."""
    rows = _mk_rows(7)
    df = spark.createDataFrame(rows, "subject_id long, timestamp timestamp, p1 long, p2 long")
    out = aggregate_temporal_window(
        df, TemporalWindowBounds(False, timedelta(0), False, timedelta(0))
    )
    pdf = out.toPandas()
    assert (pdf["p1"] == 0).all() and (pdf["p2"] == 0).all()


def test_singleton_subject(spark):
    """1-row partitions work without the reference's special case
    (``src/aces/aggregate.py:10-88``)."""
    df = spark.createDataFrame(
        [(1, datetime(2020, 1, 1), 5)], "subject_id long, timestamp timestamp, p long"
    )
    both = aggregate_temporal_window(df, TemporalWindowBounds(True, timedelta(days=1), True, None))
    assert both.collect()[0]["p"] == 5
    none = aggregate_temporal_window(df, TemporalWindowBounds(False, timedelta(days=1), False, None))
    assert none.collect()[0]["p"] == 0


# ----- exact golden frames ported verbatim from the reference's doctest
# corpus (``/root/reference/src/aces/aggregate.py:142-283``). The
# differential oracle above is stronger, but these pin the reference's
# exact frames — cheap insurance against a shared bug in kernel + oracle.

DOCTEST_ROWS = [
    (1, datetime(1989, 12, 1, 12, 3), 1, 0, 1),
    (1, datetime(1989, 12, 2, 5, 17), 0, 1, 1),
    (1, datetime(1989, 12, 2, 12, 3), 1, 0, 0),
    (1, datetime(1989, 12, 6, 11, 0), 0, 1, 0),
    (2, datetime(1989, 12, 1, 13, 14), 0, 1, 1),
    (2, datetime(1989, 12, 3, 15, 17), 0, 0, 0),
]

# (bounds, [(is_A, is_B, is_C) per row in (subject_id, timestamp) order])
DOCTEST_FRAMES = [
    (
        TemporalWindowBounds(True, timedelta(days=7), True, None),
        [(2, 2, 2), (1, 2, 1), (1, 1, 0), (0, 1, 0), (0, 1, 1), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(True, timedelta(days=1), True, timedelta(days=0)),
        [(2, 1, 2), (1, 1, 1), (1, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(True, timedelta(days=1), False, timedelta(days=0)),
        [(1, 1, 2), (1, 1, 1), (1, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(False, timedelta(days=1), False, timedelta(days=0)),
        [(0, 1, 1), (1, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(False, timedelta(days=-1), False, timedelta(days=0)),
        [(0, 0, 0), (1, 0, 1), (0, 1, 1), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(False, timedelta(hours=12), False, timedelta(hours=12)),
        [(0, 1, 1), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(False, timedelta(days=-1), True, timedelta(days=1)),
        [(1, 1, 1), (1, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0)],
    ),
    (
        TemporalWindowBounds(True, timedelta(days=-1), False, timedelta(days=1)),
        [(1, 1, 2), (1, 1, 1), (1, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 0)],
    ),
]


@pytest.mark.parametrize(
    ("bounds", "expected"),
    DOCTEST_FRAMES,
    ids=[
        f"li{b.left_inclusive}-ws{b.window_size}-ri{b.right_inclusive}-off{b.offset}"
        for b, _ in DOCTEST_FRAMES
    ],
)
def test_temporal_window_reference_doctest_frames(spark, bounds, expected):
    df = spark.createDataFrame(
        DOCTEST_ROWS, "subject_id long, timestamp timestamp, is_A long, is_B long, is_C long"
    )
    got = as_sorted_pdf(aggregate_temporal_window(df, bounds), ["subject_id", "timestamp"])
    assert len(got) == len(DOCTEST_ROWS)
    off = bounds.offset or timedelta(0)
    for i, (sid, ts, *_vals) in enumerate(DOCTEST_ROWS):
        assert got.loc[i, "subject_id"] == sid
        assert got.loc[i, "timestamp"].to_pydatetime() == ts
        assert got.loc[i, "timestamp_at_start"].to_pydatetime() == ts + off
        assert got.loc[i, "timestamp_at_end"].to_pydatetime() == ts + off + bounds.window_size
        assert (
            got.loc[i, "is_A"],
            got.loc[i, "is_B"],
            got.loc[i, "is_C"],
        ) == expected[i], f"row {i} ({sid}, {ts})"
