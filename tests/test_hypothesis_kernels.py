"""Property-based kernel tests (hypothesis), mirroring the reference's
``tests/test_aggregate_hypothesis.py``: random small frames × random window
parameters, verified against per-row brute-force oracles.

The seeded-random differential suites (``test_temporal_window.py``,
``test_event_bound_hypothesis.py``) cover fixed grids; this adds shrinking
adversarial search over the same space — frames up to 3 subjects × 20
events with duplicate-timestamp collapse already applied, window sizes and
offsets in ±48h, all four closedness modes.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aces_spark.operators.aggregate import (
    aggregate_temporal_window,
    boolean_expr_bound_sum,
)
from aces_spark.types import TemporalWindowBounds

from test_event_bound_hypothesis import simulate

EPOCH = datetime(2020, 1, 1)
US_H = 3_600 * 1_000_000


@st.composite
def frames(draw):
    rows = []
    for sid in range(1, draw(st.integers(1, 3)) + 1):
        hours = draw(
            st.lists(st.integers(0, 200), min_size=1, max_size=20, unique=True)
        )
        for h in sorted(hours):
            rows.append((sid, h, draw(st.integers(0, 3)), draw(st.booleans())))
    return rows


temporal_params = st.tuples(
    st.booleans(),  # left_inclusive
    st.integers(-48, 48),  # window hours
    st.booleans(),  # right_inclusive
    st.integers(-24, 24),  # offset hours
)

event_params = st.tuples(
    st.sampled_from(["row_to_bound", "bound_to_row"]),
    st.sampled_from(["both", "left", "right", "none"]),
    st.integers(-24, 24),  # offset hours
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(sid, EPOCH + timedelta(hours=h), v, int(b)) for sid, h, v, b in rows],
        "subject_id long, timestamp timestamp, val long, bnd long",
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=frames(), params=temporal_params)
def test_temporal_kernel_property(spark, rows, params):
    li, ws_h, ri, off_h = params
    bounds = TemporalWindowBounds(li, timedelta(hours=ws_h), ri, timedelta(hours=off_h))
    out = aggregate_temporal_window(_df(spark, rows), bounds)
    got = {
        (r.subject_id, r.timestamp): (r.timestamp_at_start, r.timestamp_at_end, r.val, r.bnd)
        for r in out.collect()
    }

    by_sid: dict = {}
    for sid, h, v, b in rows:
        by_sid.setdefault(sid, []).append((h, v, int(b)))
    lo_off, hi_off = off_h + min(ws_h, 0), off_h + max(ws_h, 0)
    for sid, items in by_sid.items():
        for h, _, _ in items:
            lo, hi = h + lo_off, h + hi_off
            sv = sb = 0
            for h2, v2, b2 in items:
                ok_lo = h2 >= lo if li else h2 > lo
                ok_hi = h2 <= hi if ri else h2 < hi
                if ok_lo and ok_hi:
                    sv += v2
                    sb += b2
            key = (sid, EPOCH + timedelta(hours=h))
            want = (
                EPOCH + timedelta(hours=h + off_h),
                EPOCH + timedelta(hours=h + off_h + ws_h),
                sv,
                sb,
            )
            assert got[key] == want, f"row {key}: {got[key]} != {want}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=frames(), params=event_params)
def test_event_bound_kernel_property(spark, rows, params):
    mode, closed, off_h = params
    out = boolean_expr_bound_sum(
        _df(spark, rows), F.col("bnd") > 0, mode, closed, timedelta(hours=off_h)
    )
    got = sorted(
        (
            r.subject_id,
            r.timestamp,
            r.timestamp_at_start,
            r.timestamp_at_end,
            r.val,
            r.bnd,
        )
        for r in out.collect()
    )

    sim_rows, boundary_idx = [], set()
    for i, (sid, h, v, b) in enumerate(rows):
        sim_rows.append((sid, h * US_H, v, int(b)))
        if b:
            boundary_idx.add(i)
    res = simulate(sim_rows, boundary_idx, mode, closed, offset_us=off_h * US_H)

    def ts(us):
        return None if us is None else EPOCH + timedelta(microseconds=us)

    want = sorted(
        (sid, ts(t), ts(st_), ts(end), v, b) for sid, t, st_, end, v, b in res
    )
    assert got == want
