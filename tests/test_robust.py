"""Winsorized stats (datapipe/analytics.py) and JL random projection
(datapipe/similarity.py) — hand-computed goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.analytics import winsorized_stats
from aces_spark.datapipe.similarity import _rademacher_matrix, random_projection


def test_winsorize_hand_computed_integers(spark):
    df = spark.createDataFrame(
        [(1, float(v)) for v in range(11)], "k long, value double"
    )
    got = winsorized_stats(df, "k", lo_bp=1000, hi_bp=9000).collect()[0]
    # p10 of 0..10 lands exactly on 1, p90 on 9; clamping 0->1 and 10->9
    # shifts the sum by +1-1 = 0 -> mean stays 5.0
    assert got["lo_bound"] == 1.0 and got["hi_bound"] == 9.0
    assert got["win_mean"] == 5.0 and got["n_points"] == 11


def test_winsorize_fractional_interpolation(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (1, 1.0), (1, 2.0), (1, 3.0)], "k long, value double"
    )
    got = winsorized_stats(df, "k", lo_bp=2500, hi_bp=7500).collect()[0]
    # pos = 3*0.25 = 0.75 -> 0 + 0.75*(1-0) = 0.75; hi: 2 + 0.25 = 2.25
    assert got["lo_bound"] == 0.75 and got["hi_bound"] == 2.25
    # clamped [0.75, 1, 2, 2.25] -> mean 1.5
    assert got["win_mean"] == 1.5


def test_winsorize_negative_mean_sign_decomposed(spark):
    df = spark.createDataFrame(
        [(1, -0.1), (1, -0.2), (1, -0.4)], "k long, value double"
    )
    got = winsorized_stats(df, "k", lo_bp=0, hi_bp=10000).collect()[0]
    # no clamping; -0.7/3 in micro-units truncates toward zero: -233333
    assert got["win_mean"] == -0.233333


def test_winsorize_validates(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, value double")
    with pytest.raises(ValueError):
        winsorized_stats(df, "k", lo_bp=5000, hi_bp=100)


def test_winsorize_single_exchange_plan(spark):
    df = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k long, value double")
    plan = (
        winsorized_stats(df, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # shared by windows + agg
    assert "Join" not in plan


def test_random_projection_matches_numpy(spark):
    import numpy as np

    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5, -0.5, 0.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = random_projection(emb, out_dim=3)
    got = {
        (r["vec_id"], r["dim_idx"]): r["proj"] for r in out.collect()
    }
    mat = np.array(_rademacher_matrix(4, 3))
    assert set(np.unique(mat)) <= {-1.0, 1.0}
    for vid, vec in rows:
        expect = mat @ np.array(vec)
        for j in range(3):
            assert got[(vid, j)] == round(float(expect[j]), 6)


def test_random_projection_deterministic_and_seeded(spark):
    emb = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    a = sorted(map(tuple, random_projection(emb, out_dim=2, seed=0).collect()))
    b = sorted(map(tuple, random_projection(emb, out_dim=2, seed=0).collect()))
    c = sorted(map(tuple, random_projection(emb, out_dim=2, seed=7).collect()))
    assert a == b and a != c
    with pytest.raises(ValueError):
        random_projection(emb, out_dim=0)


def test_random_projection_map_only_plan(spark):
    emb = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    plan = (
        random_projection(emb, out_dim=2, in_dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
