"""Tests for the count-min sketch (datapipe/sketches.py cms_*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.sketches import cms_lookup, cms_merge, cms_registers


@pytest.fixture()
def skewed(spark):
    # key "hot" appears 50x, "warm" 5x, singles once each
    rows = [("hot",)] * 50 + [("warm",)] * 5 + [(f"s{i}",) for i in range(20)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_undercounts(spark, skewed):
    regs = cms_registers(skewed, "k")
    est = {
        r["k"]: r["est_count"]
        for r in cms_lookup(regs, skewed, "k").collect()
    }
    true = {r["k"]: r["cnt"] for r in skewed.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    # with 25 keys in a 4x1024 sketch, collisions are ~0: estimates exact
    assert est == true


def test_cms_merge_equals_whole(spark, skewed):
    a = skewed.filter(F.col("k").startswith("s"))
    b = skewed.filter(~F.col("k").startswith("s"))
    merged = cms_merge(cms_registers(a, "k"), cms_registers(b, "k"))
    whole = cms_registers(skewed, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_unseen_key_estimates_zero_when_sparse(spark, skewed):
    regs = cms_registers(skewed, "k")
    probe = spark.createDataFrame([("never-seen",)], "k string")
    est = cms_lookup(regs, probe, "k").collect()[0]["est_count"]
    # tiny sketch occupancy -> all 4 probed slots almost surely empty
    assert est == 0


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 3), ("a", 4), ("b", 10)], "k string, w int")
    regs = cms_registers(df, "k", weight_col="w")
    est = {r["k"]: r["est_count"] for r in cms_lookup(regs, df, "k").collect()}
    assert est == {"a": 7, "b": 10}


def test_cms_register_table_is_bounded(spark, skewed):
    regs = cms_registers(skewed, "k", depth=3, width=64)
    assert regs.count() <= 3 * 64
    assert dict(regs.dtypes) == {
        "sketch_row": "int", "slot": "int", "cnt": "bigint"
    }


def test_cms_partition_invariance(spark, skewed):
    one = cms_registers(skewed.coalesce(1), "k")
    many = cms_registers(skewed.repartition(7), "k")
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_cms_validates(spark, skewed):
    with pytest.raises(ValueError):
        cms_registers(skewed, "k", depth=0)
    with pytest.raises(ValueError):
        cms_registers(skewed, "k", width=1)
    with pytest.raises(ValueError):
        cms_merge()


def test_cms_lookup_broadcasts_registers(spark, skewed):
    regs = cms_registers(skewed, "k")
    plan = (
        cms_lookup(regs, skewed, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# --- histogram quantile sketch (same mergeable-register family) ---

from aces_spark.datapipe.sketches import (  # noqa: E402
    hist_merge,
    hist_quantiles,
    hist_registers,
)


@pytest.fixture()
def uniform(spark):
    return spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))


def test_hist_quantiles_within_one_bucket(spark, uniform):
    regs = hist_registers(uniform, "v", lo=0.0, hi=100.0, buckets=100)
    est = {
        r["q"]: r["est_value"]
        for r in hist_quantiles(
            regs, [0.5, 0.9], lo=0.0, hi=100.0, buckets=100
        ).collect()
    }
    # true p50 of 0..99 uniform = 49.5, p90 = 89.x; bucket width 1
    assert abs(est[0.5] - 50.0) <= 1.0
    assert abs(est[0.9] - 90.0) <= 1.0


def test_hist_merge_equals_whole(spark, uniform):
    a = uniform.filter(F.col("v") < 30)
    b = uniform.filter(F.col("v") >= 30)
    merged = hist_merge(
        hist_registers(a, "v", lo=0.0, hi=100.0, buckets=50),
        hist_registers(b, "v", lo=0.0, hi=100.0, buckets=50),
    )
    whole = hist_registers(uniform, "v", lo=0.0, hi=100.0, buckets=50)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hist_clamps_out_of_domain(spark):
    df = spark.createDataFrame([(-5.0,), (999.0,), (50.0,)], "v double")
    regs = {
        r["bucket"]: r["cnt"]
        for r in hist_registers(df, "v", lo=0.0, hi=100.0, buckets=10).collect()
    }
    assert regs == {0: 1, 9: 1, 5: 1}  # edges counted, nothing dropped


def test_hist_register_table_bounded_and_null_safe(spark):
    df = spark.createDataFrame([(None,), (1.0,)], "v double")
    regs = hist_registers(df, "v", lo=0.0, hi=10.0, buckets=4)
    rows = regs.collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 1


def test_hist_validates(spark, uniform):
    with pytest.raises(ValueError):
        hist_registers(uniform, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        hist_registers(uniform, "v", lo=0.0, hi=1.0, buckets=0)
    regs = hist_registers(uniform, "v", lo=0.0, hi=100.0)
    with pytest.raises(ValueError):
        hist_quantiles(regs, [0.0], lo=0.0, hi=100.0)
    with pytest.raises(ValueError):
        hist_merge()


# --- per-key HLL distinct ---

from aces_spark.datapipe.sketches import hll_distinct, hll_distinct_by  # noqa: E402


def test_hll_by_key_close_to_exact(spark):
    rows = [("a", i) for i in range(300)] + [("b", i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v long")
    est = {
        r["k"]: r["estimate"] for r in hll_distinct_by(df, "k", "v").collect()
    }
    assert abs(est["a"] - 300) / 300 < 0.15  # ~4.6% typical error at p=9
    assert abs(est["b"] - 7) < 1.0  # linear-counting regime: near-exact


def test_hll_by_key_single_group_matches_global(spark):
    df = spark.createDataFrame(
        [("only", i) for i in range(500)], "k string, v long"
    )
    per = hll_distinct_by(df, "k", "v").collect()[0]
    glob = hll_distinct(df, "v").collect()[0]
    assert per["estimate"] == glob["estimate"]
    assert per["n_empty_registers"] == glob["n_empty_registers"]


def test_hll_by_key_null_values_ignored(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 1)], "k string, v long"
    )
    r = hll_distinct_by(df, "k", "v").collect()[0]
    assert abs(r["estimate"] - 1.0) < 0.01


def test_hll_by_key_validates(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        hll_distinct_by(df, "k", "v", p=3)


def test_cms_fractional_weights_round_half_up(spark):
    """A truncating cast would map 0.9 -> 0 (silent undercount); weights
    snap per-row with round-half-up instead."""
    df = spark.createDataFrame(
        [("a", 0.9), ("a", 1.4), ("b", 2.5)], "k string, w double"
    )
    regs = cms_registers(df, "k", weight_col="w")
    est = {r["k"]: r["est_count"] for r in cms_lookup(regs, df, "k").collect()}
    assert est == {"a": 2, "b": 3}  # 1 + 1, and 2.5 -> 3


def test_hll_empty_and_all_null_inputs_estimate_zero(spark):
    from aces_spark.datapipe.sketches import hll_distinct, hll_merge, hll_registers

    empty = spark.createDataFrame([], "k string")
    row = hll_distinct(empty, "k").collect()[0]
    assert row["estimate"] == 0.0 and row["n_empty_registers"] == row["m"]

    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    assert hll_distinct(nulls, "k").collect()[0]["estimate"] == 0.0

    regs = hll_registers(empty, "k", p=9)
    assert hll_merge(regs, p=9).collect()[0]["estimate"] == 0.0
