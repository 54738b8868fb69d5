"""Property-based differential test for the event-bound kernel.

A pure-Python simulator reimplements the reference algorithm literally
(epsilon-shifted pseudo-rows + stable sort + directional fill,
``src/aces/aggregate.py:964-1092``) and hypothesis-style randomized frames
check the Spark kernel against it across all mode × closed combinations —
mirroring the reference's hypothesis suite
(``tests/test_aggregate_hypothesis.py``) but for the harder kernel.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from aces_spark import boolean_expr_bound_sum


def simulate(rows, boundary_idx, mode, closed, offset_us=0):
    """Literal reimplementation of the reference's union/epsilon algorithm
    over (sid, ts_us, vals...) tuples. Returns rows of
    (sid, ts_us, start_us|None, end_us|None, vals...)."""
    out = []
    by_subject: dict = {}
    for i, (sid, ts, *vals) in enumerate(rows):
        by_subject.setdefault(sid, []).append((ts, vals, i in boundary_idx))

    exclude_boundary = (mode == "bound_to_row" and closed in ("left", "both")) or (
        mode == "row_to_bound" and closed not in ("right", "both")
    )
    if mode == "bound_to_row":
        eps = -1 if closed in ("left", "both") else 1
    else:
        eps = 1 if closed in ("right", "both") else -1

    for sid, items in by_subject.items():
        items.sort()
        n_vals = len(items[0][1])
        cums = []
        acc = [0] * n_vals
        for ts, vals, _ in items:
            acc = [a + v for a, v in zip(acc, vals)]
            cums.append(list(acc))

        # pseudo rows: (key, tie, ts_at_boundary, bcum)
        pseudo = []
        for j, (ts, vals, is_b) in enumerate(items):
            if is_b:
                bcum = [c - (v if exclude_boundary else 0) for c, v in zip(cums[j], vals)]
                pseudo.append((ts - offset_us + eps, 1, ts, bcum))
        merged = [(items[j][0], 0, j) for j in range(len(items))] + pseudo
        merged.sort(key=lambda x: (x[0], x[1]))  # real rows first on ties

        fills: dict[int, tuple] = {}
        if mode == "bound_to_row":
            last = (None, None)
            for entry in merged:
                if entry[1] == 1:
                    last = (entry[2], entry[3])
                else:
                    fills[entry[2]] = last
        else:
            nxt = (None, None)
            for entry in reversed(merged):
                if entry[1] == 1:
                    nxt = (entry[2], entry[3])
                else:
                    fills[entry[2]] = nxt

        # step 5: temporal aggregation over the offset interval
        # (ref :969-995, :1094-1113)
        off_sums = None
        if offset_us != 0:
            if offset_us > 0:
                li = False
                ri = (
                    closed not in ("left", "both")
                    if mode == "row_to_bound"
                    else closed in ("right", "both")
                )
            else:
                ri = False
                li = (
                    closed in ("left", "both")
                    if mode == "row_to_bound"
                    else closed not in ("right", "both")
                )
            off_sums = []
            for ts, _, _ in items:
                lo = ts + min(offset_us, 0)
                hi = ts + max(offset_us, 0)
                acc2 = [0] * n_vals
                for ts2, vals2, _ in items:
                    lo_ok = ts2 >= lo if li else ts2 > lo
                    hi_ok = ts2 <= hi if ri else ts2 < hi
                    if lo_ok and hi_ok:
                        acc2 = [a + v for a, v in zip(acc2, vals2)]
                off_sums.append(acc2)
            if mode == "bound_to_row":
                off_sign = 1 if offset_us > 0 else -1
            else:
                off_sign = -1 if offset_us > 0 else 1

        for j, (ts, vals, _) in enumerate(items):
            bts, bcum = fills[j]
            sums = []
            for k in range(n_vals):
                if bcum is None:
                    sums.append(0)
                    continue
                if mode == "bound_to_row":
                    v = cums[j][k] - bcum[k]
                    if (closed in ("left", "none") and offset_us <= 0) or offset_us < 0:
                        v -= vals[k]
                else:
                    v = bcum[k] - cums[j][k]
                    if (closed in ("left", "both") and offset_us <= 0) or offset_us < 0:
                        v += vals[k]
                if off_sums is not None:
                    v += off_sign * off_sums[j][k]
                sums.append(v)
            if mode == "bound_to_row":
                st, end = bts, (ts + offset_us if bts is not None else None)
            else:
                st, end = (ts + offset_us if bts is not None else None), bts
            out.append((sid, ts, st, end, *sums))
    return sorted(out)


def _mk_case(seed):
    rng = random.Random(seed)
    rows = []
    i = 0
    boundary_idx = set()
    for sid in range(1, rng.randint(2, 4)):
        times = sorted(rng.sample(range(0, 500), rng.randint(1, 20)))
        for t in times:
            rows.append((sid, t, rng.randint(0, 2)))
            if rng.random() < 0.3:
                boundary_idx.add(i)
            i += 1
    return rows, boundary_idx


EPOCH = datetime(2020, 1, 1)

CASES = [
    (mode, closed, off)
    for mode in ("bound_to_row", "row_to_bound")
    for closed in ("both", "left", "right", "none")
    for off in (0, 7, -7)
]


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("mode,closed,off", CASES, ids=lambda v: str(v))
def test_event_bound_vs_simulator(spark, seed, mode, closed, off):
    rows, boundary_idx = _mk_case(seed)
    # offsets in whole seconds, row times in seconds spacing
    data = [
        (sid, EPOCH + timedelta(seconds=t), 1 if i in boundary_idx else 0, v)
        for i, (sid, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "subject_id long, timestamp timestamp, is_bnd long, val long"
    )
    out = boolean_expr_bound_sum(
        df, F.col("is_bnd") > 0, mode, closed, timedelta(seconds=off)
    )
    got = sorted(
        (
            r["subject_id"],
            int((r["timestamp"] - EPOCH).total_seconds()),
            int((r["timestamp_at_start"] - EPOCH).total_seconds())
            if r["timestamp_at_start"] is not None
            else None,
            int((r["timestamp_at_end"] - EPOCH).total_seconds())
            if r["timestamp_at_end"] is not None
            else None,
            r["is_bnd"],
            r["val"],
        )
        for r in out.collect()
    )

    # simulator runs in true microseconds (eps = 1 μs) so the epsilon
    # tie-break semantics match the engine exactly
    sim_rows = [
        (sid, t * 1_000_000, 1 if i in boundary_idx else 0, v)
        for i, (sid, t, v) in enumerate(rows)
    ]
    want_us = simulate(sim_rows, boundary_idx, mode, closed, offset_us=off * 1_000_000)
    want = sorted(
        (
            sid,
            ts // 1_000_000,
            st // 1_000_000 if st is not None else None,
            end // 1_000_000 if end is not None else None,
            b,
            v,
        )
        for sid, ts, st, end, b, v in want_us
    )
    assert got == want
