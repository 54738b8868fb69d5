"""Tests for operators/timeseries.py: as-of join, range join, gap-fill,
time rollup — differential-checked against naive formulations."""

from __future__ import annotations

import datetime
from datetime import timedelta

import pytest
from pyspark.sql import Row, functions as F

from aces_spark.operators.timeseries import (
    asof_join,
    gapfill_locf,
    range_join,
    time_rollup,
)

from tests.conftest import ts


def _events(spark):
    rows = [
        # (user, event_id, ts, kind, value)
        (1, 1, "2024-01-01 00:00", "quote", 10.0),
        (1, 2, "2024-01-01 00:05", "quote", 11.0),
        (1, 3, "2024-01-01 00:05", "quote", 12.0),  # tie with id 2
        (1, 4, "2024-01-01 00:10", "trade", 99.0),
        (1, 5, "2024-01-01 00:05", "trade", 98.0),  # boundary: ts == quote ts
        (1, 6, "2024-01-01 00:02", "trade", 97.0),
        (2, 7, "2024-01-01 09:00", "trade", 50.0),  # no quote at all for user 2
        (2, 8, "2024-01-01 09:30", "quote", 51.0),
        (2, 9, "2024-01-01 10:00", "trade", 52.0),
        (3, 10, "2024-01-02 00:00", "quote", 7.0),
    ]
    return spark.createDataFrame(
        [Row(user_id=u, event_id=e, ts=ts(t), kind=k, value=v) for u, e, t, k, v in rows]
    )


class TestAsofJoin:
    def test_backward_inclusive_with_ties(self, spark):
        ev = _events(spark)
        trades = ev.filter(F.col("kind") == "trade").select("user_id", "event_id", "ts")
        quotes = (
            ev.filter(F.col("kind") == "quote")
            .select("user_id", "ts", F.col("event_id").alias("qid"), F.col("value").alias("qval"))
        )
        out = asof_join(
            trades, quotes, on="user_id", right_cols=["qval"], right_order="qid"
        )
        got = {r["event_id"]: r["qval"] for r in out.collect()}
        # trade 4 @00:10 -> last quote <= 00:10 is the 00:05 pair; tie -> qid 3
        # trade 5 @00:05 -> inclusive boundary -> qid 3
        # trade 6 @00:02 -> quote 1 @00:00
        # trade 7 user2 @09:00 -> no quote yet -> null
        # trade 9 user2 @10:00 -> quote 8
        assert got == {4: 12.0, 5: 12.0, 6: 10.0, 7: None, 9: 51.0}

    def test_forward_and_tolerance(self, spark):
        ev = _events(spark)
        trades = ev.filter(F.col("kind") == "trade").select("user_id", "event_id", "ts")
        quotes = (
            ev.filter(F.col("kind") == "quote")
            .select("user_id", "ts", F.col("event_id").alias("qid"), F.col("value").alias("qval"))
        )
        out = asof_join(
            trades, quotes, on="user_id", right_cols=["qval"], right_order="qid",
            direction="forward",
        )
        got = {r["event_id"]: r["qval"] for r in out.collect()}
        # forward: smallest quote ts >= trade ts; tie -> SMALLEST qid (qid 2)
        assert got == {4: None, 5: 11.0, 6: 11.0, 7: 51.0, 9: None}

        tol = asof_join(
            trades, quotes, on="user_id", right_cols=["qval"], right_order="qid",
            direction="forward", tolerance=timedelta(minutes=10),
        )
        got_tol = {r["event_id"]: r["qval"] for r in tol.collect()}
        # trade 7 @09:00 -> next quote 09:30 is 30 min away -> nulled by tolerance
        assert got_tol == {4: None, 5: 11.0, 6: 11.0, 7: None, 9: None}

    def test_differential_vs_naive_join(self, spark):
        """Random-ish slice of the synthetic events table vs the naive
        range-join + row_number argmax formulation."""
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        left = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        )
        right = ev.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("ts").alias("vts"),
            F.col("event_id").alias("vid"),
            F.col("value").alias("vval"),
        )
        got = asof_join(
            left, right, on="user_id", right_ts="vts",
            right_cols=["vid", "vval"], right_order="vid",
        ).select("event_id", "vid", "vval")

        from pyspark.sql import Window

        cand = left.join(right, "user_id").filter(F.col("vts") <= F.col("ts"))
        w = Window.partitionBy("event_id").orderBy(
            F.col("vts").desc(), F.col("vid").desc()
        )
        naive = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "vid", "vval")
        )
        naive_full = left.select("event_id").join(naive, "event_id", "left")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive_full.collect())
        )

    def test_single_exchange_plan(self, spark):
        ev = _events(spark)
        trades = ev.filter(F.col("kind") == "trade").select("user_id", "event_id", "ts")
        quotes = ev.filter(F.col("kind") == "quote").select(
            "user_id", "ts", F.col("value").alias("qval")
        )
        plan = asof_join(trades, quotes, on="user_id", right_cols=["qval"])._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # union-fill formulation: no join operator
        assert plan.count("Exchange hashpartitioning") == 1


class TestRangeJoin:
    def test_matches_naive_inequality_join(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        purch = ev.filter(F.col("event_type") == "purchase")
        iv = purch.select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("interval 90 minutes")).alias("end_ts"),
        )
        left = ev.select("user_id", "event_id", "ts")
        got = range_join(left, iv, on="user_id").select("event_id", "purchase_id")
        naive = (
            left.join(iv, "user_id")
            .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
            .select("event_id", "purchase_id")
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))

    def test_boundary_half_open(self, spark):
        left = spark.createDataFrame(
            [Row(ts=ts("2024-01-01 01:00"), i=1), Row(ts=ts("2024-01-01 02:00"), i=2)]
        )
        iv = spark.createDataFrame(
            [Row(start_ts=ts("2024-01-01 01:00"), end_ts=ts("2024-01-01 02:00"), w=1)]
        )
        got = [r["i"] for r in range_join(left, iv).collect()]
        assert got == [1]  # start inclusive, end exclusive


class TestGapfillLocf:
    def test_fills_gaps_with_last_obs(self, spark):
        rows = [
            (1, "2024-01-01 00:10", 1.0, 1),
            (1, "2024-01-01 00:20", 2.0, 2),  # two obs in bucket 00:00 -> last wins
            (1, "2024-01-01 03:30", 9.0, 3),  # 2-hour gap (01:00, 02:00 empty)
            (2, "2024-01-01 05:00", 4.0, 4),
        ]
        df = spark.createDataFrame(
            [Row(user_id=u, ts=ts(t), value=v, event_id=e) for u, t, v, e in rows]
        )
        out = gapfill_locf(df, on="user_id", bucket="hour", order_col="event_id")
        got = sorted(
            (r["user_id"], r["grid_ts"].isoformat(), r["value"], r["is_observed"])
            for r in out.collect()
        )
        assert got == [
            (1, "2024-01-01T00:00:00", 2.0, True),
            (1, "2024-01-01T01:00:00", 2.0, False),
            (1, "2024-01-01T02:00:00", 2.0, False),
            (1, "2024-01-01T03:00:00", 9.0, True),
            (2, "2024-01-01T05:00:00", 4.0, True),
        ]

    def test_max_buckets_guard(self, spark):
        df = spark.createDataFrame(
            [
                Row(user_id=1, ts=ts("2024-01-01 00:00"), value=1.0, event_id=1),
                Row(user_id=1, ts=ts("2024-03-01 00:00"), value=2.0, event_id=2),
            ]
        )
        out = gapfill_locf(df, on="user_id", bucket="hour", max_buckets=100)
        with pytest.raises(Exception, match="max_buckets"):
            out.collect()

    def test_bad_bucket_rejected(self, spark):
        df = spark.createDataFrame([Row(user_id=1, ts=ts("2024-01-01"), value=1.0)])
        with pytest.raises(ValueError, match="bucket"):
            gapfill_locf(df, on="user_id", bucket="fortnight")


class TestTimeRollup:
    def test_grains_match_separate_groupbys(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = time_rollup(
            ev, by="event_type", grains=["hour", "day"],
            aggs=[F.count(F.lit(1)).cast("long").alias("n_events")],
        ).collect()
        by_grain = {}
        for r in out:
            by_grain.setdefault(r["grain"], []).append(
                (r["bucket_ts"], r["event_type"], r["n_events"])
            )
        for grain in ("hour", "day"):
            want = sorted(
                (r[0], r[1], r[2])
                for r in ev.groupBy(
                    F.date_trunc(grain, F.col("ts").cast("timestamp")).alias("b"),
                    "event_type",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .collect()
            )
            assert sorted(by_grain[grain]) == want
        want_all = sorted(
            (None, r[0], r[1])
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
        assert sorted(by_grain["all"]) == want_all

    def test_single_shuffle(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = time_rollup(ev, by="event_type")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestAsofJoinChunked:
    def test_bit_identical_to_unchunked(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        left = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        )
        right = ev.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("ts").alias("vts"),
            F.col("event_id").alias("vid"),
            F.col("value").alias("vval"),
        )
        from aces_spark.operators.timeseries import asof_join_chunked

        kw = dict(
            on="user_id", left_ts="ts", right_ts="vts",
            right_cols=["vid", "vval"], right_order="vid",
        )
        base = asof_join(left, right, **kw).select("event_id", "vid", "vval")
        for chunk in (timedelta(days=1), timedelta(hours=6)):
            chunked = asof_join_chunked(left, right, chunk=chunk, **kw).select(
                "event_id", "vid", "vval"
            )
            assert sorted(map(tuple, chunked.collect())) == sorted(
                map(tuple, base.collect())
            )

    def test_tolerance_matches_unchunked(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        left = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        )
        right = ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("vts"),
            F.col("event_id").alias("vid"), F.col("value").alias("vval"),
        )
        from aces_spark.operators.timeseries import asof_join_chunked

        kw = dict(
            on="user_id", left_ts="ts", right_ts="vts",
            right_cols=["vval"], right_order="vid",
            tolerance=timedelta(hours=12),
        )
        base = asof_join(left, right, **kw).select("event_id", "vval")
        chunked = asof_join_chunked(
            left, right, chunk=timedelta(days=2), **kw
        ).select("event_id", "vval")
        assert sorted(map(tuple, chunked.collect())) == sorted(
            map(tuple, base.collect())
        )

    def test_carry_crosses_empty_chunks(self, spark):
        # right obs in chunk 0 only; left rows many chunks later must
        # still match through the strictly-prior carry
        rows_r = [Row(user_id=1, ts=ts("2024-01-01 00:00"), q=1.0, rid=1)]
        rows_l = [Row(user_id=1, event_id=9, ts=ts("2024-06-01 00:00"))]
        from aces_spark.operators.timeseries import asof_join_chunked

        out = asof_join_chunked(
            spark.createDataFrame(rows_l),
            spark.createDataFrame(rows_r),
            on="user_id", right_cols=["q"], right_order="rid",
            chunk=timedelta(days=7),
        ).collect()
        assert out[0]["q"] == 1.0


def test_time_rollup_global_no_by(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from aces_spark.operators.timeseries import time_rollup

    out = time_rollup(ev, grains=["day"]).collect()
    total = [r for r in out if r["grain"] == "all"]
    assert len(total) == 1 and total[0]["n_events"] == ev.count()
    daily = sum(r["n_events"] for r in out if r["grain"] == "day")
    assert daily == ev.count()


# ---- property-based as-of fuzz: random two-sided frames vs a pure-python
# oracle (backward + forward, shared tie rules) ----

from datetime import datetime as _dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EPOCH = _dt(2020, 1, 1)


@st.composite
def _asof_frames(draw):
    """1-3 keys, up to 8 left and 8 right rows per key, minute-resolution
    timestamps with deliberate collisions (0-120 range)."""
    lefts, rights = [], []
    rid = iter(range(10_000))
    for k in range(1, draw(st.integers(1, 3)) + 1):
        for m in draw(st.lists(st.integers(0, 120), min_size=0, max_size=8)):
            lefts.append((k, next(rid), _EPOCH + timedelta(minutes=m)))
        for m in draw(st.lists(st.integers(0, 120), min_size=0, max_size=8)):
            rights.append((k, next(rid), _EPOCH + timedelta(minutes=m), float(m)))
    return lefts, rights


def _py_asof(lefts, rights, direction):
    out = {}
    for k, lid, lts in lefts:
        cands = [
            (rts, rid, val)
            for (rk, rid, rts, val) in rights
            if rk == k and (rts <= lts if direction == "backward" else rts >= lts)
        ]
        if not cands:
            out[lid] = None
            continue
        if direction == "backward":
            best = max(cands, key=lambda c: (c[0], c[1]))  # latest ts, then max rid
        else:
            best = min(cands, key=lambda c: (c[0], c[1]))  # earliest ts, then min rid
        out[lid] = best[2]
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_asof_frames(), st.sampled_from(["backward", "forward"]))
def test_asof_join_fuzz_vs_python(spark, frames, direction):
    lefts, rights = frames
    if not lefts:
        return
    l = spark.createDataFrame(lefts, "k long, lid long, ts timestamp")
    if rights:
        r = spark.createDataFrame(rights, "k long, rid long, rts timestamp, val double")
    else:
        r = spark.createDataFrame(
            [], "k long, rid long, rts timestamp, val double"
        )
    got = {
        row["lid"]: row["val"]
        for row in asof_join(
            l, r, on="k", left_ts="ts", right_ts="rts",
            right_cols=["val"], right_order="rid", direction=direction,
        ).collect()
    }
    assert got == _py_asof(lefts, rights, direction)


@st.composite
def _series_frames(draw):
    """1-2 keys, 1-8 observations each at hour resolution (collisions
    allowed) — small enough for an exact python LOCF oracle."""
    rows = []
    rid = iter(range(10_000))
    for k in range(1, draw(st.integers(1, 2)) + 1):
        for h in draw(st.lists(st.integers(0, 48), min_size=1, max_size=8)):
            rows.append((k, next(rid), _EPOCH + timedelta(hours=h, minutes=draw(st.integers(0, 59))), float(draw(st.integers(0, 99)))))
    return rows


def _py_gapfill(rows, bucket_hours=1):
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, rid, ts_, v in rows:
        by_key[k].append((ts_, rid, v))
    out = []
    for k, obs in by_key.items():
        def bucket(t):
            return t.replace(minute=0, second=0, microsecond=0)
        per_bucket = {}
        for ts_, rid, v in obs:
            b = bucket(ts_)
            cur = per_bucket.get(b)
            if cur is None or (ts_, rid) > (cur[0], cur[1]):
                per_bucket[b] = (ts_, rid, v)
        lo = bucket(min(t for t, _, _ in obs))
        hi = bucket(max(t for t, _, _ in obs))
        last = None
        b = lo
        while b <= hi:
            if b in per_bucket:
                last = per_bucket[b][2]
                out.append((k, b, last, True))
            else:
                out.append((k, b, last, False))
            b = b + timedelta(hours=1)
    return sorted(out)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_series_frames())
def test_gapfill_fuzz_vs_python(spark, rows):
    df = spark.createDataFrame(rows, "k long, rid long, ts timestamp, v double")
    got = sorted(
        (r["k"], r["grid_ts"], r["v"], r["is_observed"])
        for r in gapfill_locf(
            df, on="k", ts_col="ts", value_col="v", bucket="hour", order_col="rid"
        ).collect()
    )
    assert got == _py_gapfill(rows)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 72), st.integers(1, 2)), min_size=1, max_size=10),
    st.lists(
        st.tuples(st.integers(0, 72), st.integers(1, 6), st.integers(1, 2)),
        min_size=1, max_size=6,
    ),
)
def test_range_join_fuzz_vs_python(spark, points, intervals):
    lefts = [
        (k, i, _EPOCH + timedelta(hours=h)) for i, (h, k) in enumerate(points)
    ]
    ivs = [
        (k, i, _EPOCH + timedelta(hours=h), _EPOCH + timedelta(hours=h + dur))
        for i, (h, dur, k) in enumerate(intervals)
    ]
    l = spark.createDataFrame(lefts, "k long, lid long, ts timestamp")
    iv = spark.createDataFrame(ivs, "k long, ivid long, start_ts timestamp, end_ts timestamp")
    got = sorted(
        (r["lid"], r["ivid"]) for r in range_join(l, iv, on="k", bucket="hour").collect()
    )
    want = sorted(
        (lid, ivid)
        for (lk, lid, lts) in lefts
        for (ik, ivid, s, e) in ivs
        if lk == ik and s <= lts < e
    )
    assert got == want


class TestIntervalOverlapJoin:
    def test_matches_naive_overlap(self, spark):
        from aces_spark.operators.timeseries import interval_overlap_join

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        purch = ev.filter(F.col("event_type") == "purchase")
        a = purch.select(
            "user_id", F.col("event_id").alias("aid"),
            F.col("ts").alias("a_start"),
            (F.col("ts") + F.expr("interval 2 hours")).alias("a_end"),
        )
        b = ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("bid"),
            F.col("ts").alias("b_start"),
            (F.col("ts") + F.expr("interval 90 minutes")).alias("b_end"),
        )
        got = sorted(
            (r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, "a_start", "a_end", "b_start", "b_end", on="user_id"
            ).collect()
        )
        naive = sorted(
            (r["aid"], r["bid"])
            for r in a.join(b, "user_id")
            .filter(
                (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
            )
            .collect()
        )
        assert got == naive and len(got) > 0

    def test_touching_endpoints_do_not_overlap(self, spark):
        from aces_spark.operators.timeseries import interval_overlap_join

        a = spark.createDataFrame(
            [(1, ts("2024-01-01 00:00"), ts("2024-01-01 01:00"))],
            "aid long, a_start timestamp, a_end timestamp",
        )
        b = spark.createDataFrame(
            [(2, ts("2024-01-01 01:00"), ts("2024-01-01 02:00")),
             (3, ts("2024-01-01 00:30"), ts("2024-01-01 00:45"))],
            "bid long, b_start timestamp, b_end timestamp",
        )
        got = [r["bid"] for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end"
        ).collect()]
        assert got == [3]  # half-open: touching at 01:00 is not an overlap


def test_asof_right_order_must_be_integral(spark):
    l = spark.createDataFrame([(1, ts("2024-01-01"))], "k long, ts timestamp")
    r = spark.createDataFrame(
        [(1, ts("2024-01-01"), "uuid-1", 5.0)],
        "k long, ts timestamp, rid string, v double",
    )
    with pytest.raises(ValueError, match="integral"):
        asof_join(l, r, on="k", right_cols=["v"], right_order="rid")


def test_range_join_malformed_interval_matches_nothing(spark):
    left = spark.createDataFrame([Row(ts=ts("2024-01-01 01:00"), i=1)])
    iv = spark.createDataFrame(
        [Row(start_ts=ts("2024-01-02"), end_ts=ts("2024-01-01"), w=1),  # end < start
         Row(start_ts=ts("2024-01-01 00:30"), end_ts=ts("2024-01-01 02:00"), w=2)]
    )
    got = [r["w"] for r in range_join(left, iv).collect()]
    assert got == [2]  # no crash; the inverted interval simply matches nothing


def test_overlap_join_preserves_duplicate_input_rows(spark):
    from aces_spark.operators.timeseries import interval_overlap_join

    a = spark.createDataFrame(
        [(ts("2024-01-01 00:00"), ts("2024-01-01 03:00"))] * 2,  # two identical rows
        "a_start timestamp, a_end timestamp",
    )
    b = spark.createDataFrame(
        [(9, ts("2024-01-01 01:00"), ts("2024-01-01 02:00"))],
        "bid long, b_start timestamp, b_end timestamp",
    )
    out = interval_overlap_join(a, b, "a_start", "a_end", "b_start", "b_end")
    assert out.count() == 2  # one match per duplicate left row, no collapse


# --- group_linear_trend ---

from aces_spark.operators.timeseries import group_linear_trend


def _ref_trend(rows, x_unit_us=86_400_000_000):
    """Pure-python reference of the documented integer contract."""
    import math
    by_key: dict = {}
    for k, us, v in rows:
        if us is None or v is None:
            continue
        by_key.setdefault(k, []).append((us, math.floor(v * 1000000 + 0.5)))
    out = {}
    for k, pts in by_key.items():
        m = min(us for us, _ in pts)
        xy = [((us - m) // x_unit_us, y) for us, y in pts]
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx

        def tz(a, b):  # truncate toward zero, positive b
            return -((-a) // b) if a < 0 else a // b

        slope_u = None if den == 0 else tz(num, den)
        icept_u = tz(sy - (slope_u or 0) * sx, n)
        out[k] = (
            n,
            max(x for x, _ in xy),
            None if slope_u is None else slope_u / 1000000.0,
            icept_u / 1000000.0,
        )
    return out


def _us(day_offset_hours):
    base = 1_700_000_000_000_000  # fixed modern epoch, μs
    return base + int(day_offset_hours * 3_600_000_000)


def _trend_df(spark, rows):
    import datetime as dt

    data = [
        (k, None if us is None else dt.datetime.utcfromtimestamp(us / 1e6), v)
        for k, us, v in rows
    ]
    return spark.createDataFrame(data, "k long, ts timestamp, value double")


def _got(spark, rows, **kw):
    df = _trend_df(spark, rows)
    return {
        r["k"]: (r["n_points"], r["x_span"], r["slope_per_unit"], r["intercept"])
        for r in group_linear_trend(df, "k", **kw).collect()
    }


def test_trend_matches_integer_reference(spark):
    rows = [
        (1, _us(0), 1.0), (1, _us(24), 2.0), (1, _us(48), 3.25),
        (2, _us(0), 10.0), (2, _us(24), 8.0), (2, _us(72), 4.5),  # downward
        (3, _us(5), 7.5),                                          # single point
        (4, _us(0), 1.0), (4, _us(1), 2.0),   # same day twice -> den 0
        (5, None, 1.0), (5, _us(0), None), (5, _us(24), 6.0), (5, _us(48), 7.0),
    ]
    assert _got(spark, rows) == _ref_trend([r for r in rows])


def test_trend_exact_line_recovers_slope_and_intercept(spark):
    # y = 2 + 0.5 * day, exact in micro-units
    rows = [(1, _us(24 * d), 2.0 + 0.5 * d) for d in range(6)]
    got = _got(spark, rows)
    n, span, slope, icept = got[1]
    assert (n, span) == (6, 5)
    assert slope == pytest.approx(0.5, abs=1e-6)
    assert icept == pytest.approx(2.0, abs=1e-6)


def test_trend_negative_slope_truncates_toward_zero(spark):
    # num < 0 path: both engines must truncate toward zero, and the
    # reference encodes exactly that
    rows = [(1, _us(0), 3.0), (1, _us(24), 2.0), (1, _us(72), 0.1)]
    got = _got(spark, rows)
    assert got == _ref_trend(rows)
    assert got[1][2] < 0


def test_trend_hour_grain(spark):
    rows = [(1, _us(0), 1.0), (1, _us(2), 5.0)]
    got = _got(spark, rows, x_unit_us=3_600_000_000)
    assert got == _ref_trend(rows, x_unit_us=3_600_000_000)
    assert got[1][1] == 2  # span measured in hours now


def test_trend_validates_grain(spark):
    df = _trend_df(spark, [(1, _us(0), 1.0)])
    with pytest.raises(ValueError):
        group_linear_trend(df, "k", x_unit_us=0)


def test_trend_single_exchange_plan(spark):
    df = _trend_df(spark, [(1, _us(0), 1.0), (1, _us(24), 2.0)])
    plan = (
        group_linear_trend(df, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


# --- time_weighted_avg ---

from aces_spark.operators.timeseries import time_weighted_avg


def test_twa_locf_hand_computed(spark):
    """LOCF integration: each value holds until the next observation;
    twa = sum(v_i * dt_i) / span over [t_first, t_last]."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + _dt.timedelta(seconds=s)

    rows = [
        # key 1: v=2 holds 10s, v=4 holds 30s -> (20 + 120) / 40 = 3.5
        (1, at(0), 2.0, 1),
        (1, at(10), 4.0, 2),
        (1, at(40), 9.0, 3),  # last point: zero duration
        # key 2: single observation -> its own value, span 0
        (2, at(5), 42.5, 1),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double, event_id long")
    got = {r["k"]: r for r in time_weighted_avg(df, "k").collect()}
    assert got[1]["twa"] == 3.5 and got[1]["span_secs"] == 40 and got[1]["n_points"] == 3
    assert got[2]["twa"] == 42.5 and got[2]["span_secs"] == 0 and got[2]["n_points"] == 1


def test_twa_negative_sum_sign_decomposed(spark):
    """Negative weighted sum not divisible by span: Spark's truncating
    div must be sign-decomposed so a flooring oracle engine agrees.
    wsum = -1*5 + 0.3*2 = -4.4 over span 7 -> micro-units
    -4400000 div 7 = -628571 (toward zero), twa = -0.628571."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + _dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [(1, at(0), -1.0, 1), (1, at(5), 0.3, 2), (1, at(7), 9.0, 3)],
        "k long, ts timestamp, value double, event_id long",
    )
    got = time_weighted_avg(df, "k").collect()[0]
    assert got["twa"] == -0.628571


def test_twa_null_rows_excluded_and_single_exchange(spark):
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, t0, 1.0, 1),
            (1, None, 100.0, 2),  # null ts: excluded, must not poison a duration
            (1, t0 + _dt.timedelta(seconds=10), None, 3),  # null value: excluded
            (1, t0 + _dt.timedelta(seconds=20), 3.0, 4),
        ],
        "k long, ts timestamp, value double, event_id long",
    )
    got = time_weighted_avg(df, "k").collect()[0]
    # v=1 holds the whole 20s span -> twa 1.0
    assert got["twa"] == 1.0 and got["n_points"] == 2
    plan = time_weighted_avg(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # key window + key agg reuse
