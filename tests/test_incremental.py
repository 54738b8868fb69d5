"""Tests for datapipe/incremental.py: partial-agg state maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.incremental import (
    finalize_stats,
    incremental_stats,
    merge_partials,
    partial_stats,
)


@pytest.fixture()
def vals(spark):
    rows = [
        ("a", 1.25), ("a", 2.5), ("a", None), ("b", -3.75),
        ("b", 0.000001), ("c", 10.0),
    ]
    return spark.createDataFrame(rows, "k string, v double")


def _final_map(df):
    return {
        r["k"]: (r["n"], r["mean_v"], r["min_v"], r["max_v"]) for r in df.collect()
    }


def test_merge_of_split_equals_full(spark, vals):
    full = finalize_stats(partial_stats(vals, ["k"], "v"))
    # split on an arbitrary predicate; merge must reproduce full exactly
    h = vals.filter(F.coalesce(F.col("v"), F.lit(0)) >= 0)
    d = vals.filter(F.coalesce(F.col("v"), F.lit(0)) < 0)
    inc = incremental_stats(h, d, ["k"], "v")
    assert _final_map(inc) == _final_map(full)


def test_merge_is_associative_and_commutative(spark, vals):
    parts = [
        partial_stats(vals.filter(F.col("v") < 1), ["k"], "v"),
        partial_stats(vals.filter(F.col("v") >= 1), ["k"], "v"),
        partial_stats(vals.filter(F.col("v").isNull()), ["k"], "v"),
    ]
    ab_c = merge_partials([merge_partials(parts[:2]), parts[2]])
    c_ba = merge_partials([parts[2], parts[1], parts[0]])
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(ab_c) == key(c_ba)


def test_null_values_counted_out(spark, vals):
    state = partial_stats(vals, ["k"], "v")
    a = {r["k"]: r for r in state.collect()}["a"]
    assert a["n"] == 2  # the null row contributes nothing
    assert a["sum_u"] == 1_250_000 + 2_500_000


def test_all_null_key_has_zero_state(spark):
    df = spark.createDataFrame([("z", None), ("z", None)], "k string, v double")
    r = partial_stats(df, ["k"], "v").collect()[0]
    assert (r["n"], r["sum_u"], r["min_v"], r["max_v"]) == (0, 0, None, None)
    f = finalize_stats(partial_stats(df, ["k"], "v")).collect()[0]
    assert f["mean_v"] is None  # 0/0 -> null, not a crash


def test_micro_unit_snap_half_up(spark):
    # 0.0000005 snaps to 1 micro-unit; -0.0000005 floors to -1+0.5 -> 0
    df = spark.createDataFrame(
        [("k", 0.0000005), ("k", 0.0000004)], "k string, v double"
    )
    r = partial_stats(df, ["k"], "v").collect()[0]
    assert r["sum_u"] == 1


def test_merge_partials_requires_state(spark):
    with pytest.raises(ValueError):
        merge_partials([])


def test_incremental_plan_single_aggregate_per_batch(spark, vals):
    plan = (
        partial_stats(vals, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one logical aggregate -> partial + final HashAggregate pair, one exchange
    assert plan.count("Exchange") == 1
