"""Differential tests for datapipe.evalmetrics (r10): each operator
checked against a brute-force pure-Python reference on tie-heavy
fixtures."""

from __future__ import annotations

import hashlib

import pytest

from aces_spark.datapipe.evalmetrics import (
    calibration_bins,
    group_auc,
    km_survival,
    target_encode_oof,
)


def _pairwise_auc(pairs):
    """Reference AUC: P(pos > neg) + 0.5 P(pos == neg), all pairs."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_group_auc_matches_pairwise_reference(spark):
    # tie-heavy: scores repeat across and within labels
    data = [
        ("a", 0.1, 0), ("a", 0.1, 1), ("a", 0.3, 0), ("a", 0.3, 1),
        ("a", 0.3, 1), ("a", 0.7, 0), ("a", 0.9, 1), ("a", 0.9, 1),
        ("b", 0.2, 0), ("b", 0.2, 0), ("b", 0.5, 1), ("b", 0.8, 1),
        ("b", 0.8, 0),
    ]
    df = spark.createDataFrame(data, "g string, score double, label int")
    got = {r["g"]: r for r in group_auc(df, "score", "label", "g").collect()}
    for g in ("a", "b"):
        pairs = [(s, y) for gg, s, y in data if gg == g]
        want = _pairwise_auc(pairs)
        assert abs(got[g]["auc"] - round(want, 6)) < 1e-9, g
        n_pos = sum(y for _, y in pairs)
        n_neg = len(pairs) - n_pos
        assert got[g]["n_pos"] == n_pos and got[g]["n_neg"] == n_neg
        # u2 is the exact rational numerator: auc == u2 / (2 n_pos n_neg)
        assert got[g]["u2"] == round(want * 2 * n_pos * n_neg)


def test_group_auc_drops_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("all_pos", 0.5, 1), ("all_pos", 0.9, 1), ("ok", 0.1, 0), ("ok", 0.9, 1)],
        "g string, score double, label int",
    )
    got = group_auc(df, "score", "label", "g").collect()
    assert [r["g"] for r in got] == ["ok"]
    assert got[0]["auc"] == 1.0


def test_calibration_bins_exact_counts_and_gap(spark):
    rows = [
        (0.05, 0), (0.05, 0), (0.08, 1),          # bin 0: conf .06, acc 1/3
        (0.95, 1), (0.97, 1), (0.93, 0),          # bin 9: conf .95, acc 2/3
        (1.0, 1),                                  # exactly 1.0 clamps to bin 9
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(got) == {0, 9}
    b0, b9 = got[0], got[9]
    assert (b0["n"], b0["n_pos"]) == (3, 1)
    assert b0["mean_score"] == 0.06 and b0["pos_rate"] == round(1 / 3, 6)
    assert b0["gap"] == round(abs(round(1 / 3, 6) - 0.06) * 3, 6)
    assert (b9["n"], b9["n_pos"]) == (4, 3)
    assert b9["mean_score"] == round((0.95 + 0.97 + 0.93 + 1.0) / 4, 6)


def _py_fold(key, n_folds, seed=0):
    h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8]
    return int(h, 16) % 10000 % n_folds


def test_target_encode_oof_matches_manual(spark):
    # category "x" spans folds; "solo" lives in a single fold -> global mean
    rows = [(i, "x" if i % 3 else "solo", float(i)) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {
        r["id"]: r for r in target_encode_oof(df, "cat", "y", "id", n_folds=3).collect()
    }
    micro = {i: round(y * 1_000_000) for i, _, y in rows}
    g_mean = round(sum(micro.values()) / len(micro) + 1e-12)  # floor(x+0.5) on .0 sums
    for i, cat, _ in rows:
        fold = _py_fold(i, 3)
        assert got[i]["fold"] == fold
        others = [
            micro[j] for j, c, _ in rows if c == cat and _py_fold(j, 3) != fold
        ]
        if others:
            want = round(sum(others) / (len(others) * 1_000_000), 6)
        else:
            want = round(g_mean / 1_000_000, 6)
        assert got[i]["encoded"] == pytest.approx(want, abs=1e-9), (i, cat)


def test_target_encode_oof_prior_smoothing(spark):
    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 0.0), (4, "b", 100.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {
        r["id"]: r["encoded"]
        for r in target_encode_oof(
            df, "cat", "y", "id", n_folds=2, prior_weight=2
        ).collect()
    }
    g_mean = round((10 + 20 + 0 + 100) * 1_000_000 / 4 + 1e-12)
    for i, cat, _ in rows:
        fold = _py_fold(i, 2)
        others = [
            round(y * 1_000_000)
            for j, c, y in rows
            if c == cat and _py_fold(j, 2) != fold
        ]
        want = round(
            (sum(others) + 2 * g_mean) / ((len(others) + 2) * 1_000_000), 6
        )
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_km_survival_textbook(spark):
    # classic toy: durations with events and right-censoring, incl. a
    # censor-only time (8) that must emit no step but shrink at-risk
    rows = [(6, 1), (6, 1), (6, 0), (7, 1), (8, 0), (10, 1), (10, 0), (13, 0)]
    df = spark.createDataFrame(rows, "t int, e int")
    got = {r["t"]: r for r in km_survival(df, "t", "e").collect()}
    assert set(got) == {6, 7, 10}
    assert (got[6]["n_at_risk"], got[6]["n_events"], got[6]["n_censored"]) == (8, 2, 1)
    assert got[6]["factor"] == round(6 / 8, 6)
    assert (got[7]["n_at_risk"], got[7]["n_events"]) == (5, 1)
    assert got[7]["factor"] == 0.8
    # censor at 8 removed one more: at risk at 10 is 3
    assert (got[10]["n_at_risk"], got[10]["n_events"], got[10]["n_censored"]) == (3, 1, 1)
    assert got[10]["factor"] == round(2 / 3, 6)


def test_km_survival_grouped(spark):
    rows = [("g1", 5, 1), ("g1", 9, 1), ("g2", 5, 1), ("g2", 5, 1), ("g2", 7, 0)]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    got = {(r["g"], r["t"]): r for r in km_survival(df, "t", "e", "g").collect()}
    assert got[("g1", 5)]["n_at_risk"] == 2 and got[("g1", 9)]["n_at_risk"] == 1
    assert got[("g2", 5)]["n_events"] == 2 and got[("g2", 5)]["factor"] == round(1 / 3, 6)
    assert ("g2", 7) not in got  # censor-only time emits no step
