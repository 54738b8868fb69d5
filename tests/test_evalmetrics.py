"""Differential tests for datapipe.evalmetrics (r10): each operator
checked against a brute-force pure-Python reference on tie-heavy
fixtures."""

from __future__ import annotations

import hashlib

import pytest

from aces_spark.datapipe.evalmetrics import (
    calibration_bins,
    gini_coefficient,
    group_auc,
    isotonic_fit,
    km_survival,
    ndcg_at_k,
    rank_correlation,
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


def _pav(ns, ps):
    """Reference PAV: pool adjacent violators on (n, pos) bins."""
    blocks = [[n, p] for n, p in zip(ns, ps)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fits = [(n, p / n) for n, p in blocks]
    # expand block means back to per-bin fits
    res = []
    bi = 0
    consumed = 0
    for n in ns:
        res.append(fits[bi][1])
        consumed += n
        if consumed >= fits[bi][0]:
            consumed = 0
            bi += 1
    return res


def test_isotonic_fit_matches_pav(spark):
    # deliberately non-monotone observed rates -> PAV must pool
    ns = [4, 4, 4, 4, 4]
    ps = [1, 3, 2, 1, 4]
    df = spark.createDataFrame(
        list(zip(range(5), ns, ps)), "bin int, n long, n_pos long"
    )
    got = {r["bin"]: r["y_iso"] for r in isotonic_fit(df).collect()}
    want = _pav(ns, ps)
    for b in range(5):
        assert got[b] == round(want[b], 6), (b, got, want)
    # monotone nondecreasing
    ys = [got[b] for b in range(5)]
    assert ys == sorted(ys)


def test_isotonic_fit_grouped_and_guard(spark):
    df = spark.createDataFrame(
        [("a", 0, 10, 8), ("a", 1, 10, 2), ("b", 0, 5, 1), ("b", 1, 5, 4)],
        "g string, bin int, n long, n_pos long",
    )
    got = {(r["g"], r["bin"]): r["y_iso"] for r in isotonic_fit(df, group_col="g").collect()}
    # group a violates monotonicity -> pooled to (8+2)/20
    assert got[("a", 0)] == got[("a", 1)] == 0.5
    # group b already isotonic -> untouched
    assert got[("b", 0)] == 0.2 and got[("b", 1)] == 0.8
    with pytest.raises(ValueError, match="max_bins"):
        isotonic_fit(df, group_col="g", max_bins=1).collect()


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = r
        i = j + 1
    return ranks


def test_rank_correlation_matches_manual_spearman(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 8.0, 7.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = rank_correlation(df, "x", "y").collect()[0]
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert got["n"] == n and got["rho"] == pytest.approx(round(want, 6), abs=1e-9)


def test_rank_correlation_drops_constant(spark):
    df = spark.createDataFrame(
        [("c", 1.0, 5.0), ("c", 1.0, 7.0), ("ok", 1.0, 1.0), ("ok", 2.0, 3.0)],
        "g string, x double, y double",
    )
    got = rank_correlation(df, "x", "y", "g").collect()
    assert [r["g"] for r in got] == ["ok"] and got[0]["rho"] == 1.0


def test_gini_coefficient_exact(spark):
    # perfectly equal -> 0; fully concentrated -> (n-1)/n
    eq = spark.createDataFrame([(1.0,)] * 4, "v double")
    assert gini_coefficient(eq, "v").collect()[0]["gini"] == 0.0
    conc = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (8.0,)], "v double")
    assert gini_coefficient(conc, "v").collect()[0]["gini"] == 0.75
    # textbook small case vs manual formula
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    micro = sorted(round(v * 1_000_000) for v in vals)
    n, tot = len(micro), sum(micro)
    iv = sum((i + 1) * v for i, v in enumerate(micro))
    want = (2 * iv - (n + 1) * tot) / (n * tot)
    got = gini_coefficient(df, "v").collect()[0]
    assert got["gini"] == round(want, 6) and got["total_micro"] == tot


def test_ndcg_at_k_manual(spark):
    from aces_spark.datapipe.evalmetrics import NDCG_DISCOUNT_MICRO

    # query q: scores rank docs [d1,d2,d3,d4]; relevance favors d3
    rows = [
        ("q", 0.9, 0, 1), ("q", 0.8, 2, 2), ("q", 0.7, 3, 3), ("q", 0.1, 1, 4),
        ("empty", 0.5, 0, 9),  # zero ideal gain -> dropped
    ]
    df = spark.createDataFrame(rows, "q string, score double, rel int, doc long")
    got = ndcg_at_k(df, "q", "score", "rel", "doc", k=3).collect()
    assert len(got) == 1 and got[0]["q"] == "q"
    d = NDCG_DISCOUNT_MICRO
    dcg = 0 * d[0] + 2 * d[1] + 3 * d[2]          # retrieved order d1,d2,d3
    idcg = 3 * d[0] + 2 * d[1] + 1 * d[2]         # ideal order d3,d2,d4
    assert got[0]["dcg_micro"] == dcg and got[0]["idcg_micro"] == idcg
    assert got[0]["ndcg"] == round(dcg / idcg, 6)


def test_ndcg_tiebreak_and_perfect(spark):
    # equal scores -> id asc decides; ranking identical to ideal -> 1.0
    rows = [("q", 1.0, 3, 1), ("q", 1.0, 2, 2), ("q", 1.0, 1, 3)]
    df = spark.createDataFrame(rows, "q string, score double, rel int, doc long")
    got = ndcg_at_k(df, "q", "score", "rel", "doc", k=3).collect()[0]
    assert got["ndcg"] == 1.0
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(df, "q", "score", "rel", "doc", k=99)


def test_poisson_bootstrap_weights_and_means(spark):
    from aces_spark.datapipe.evalmetrics import (
        POISSON1_THRESHOLDS,
        poisson_bootstrap_means,
    )

    rows = [(i, float(i * 10)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["rep"]: r for r in poisson_bootstrap_means(df, "v", "id", n_reps=5).collect()}

    def weight(rep, rid):
        b = int(hashlib.md5(f"0|{rep}#{rid}".encode()).hexdigest()[:8], 16) % 10000
        for c, thr in enumerate(POISSON1_THRESHOLDS):
            if b < thr:
                return c
        return 5

    for rep in range(5):
        ws = {rid: weight(rep, rid) for rid, _ in rows}
        n_eff = sum(ws.values())
        if n_eff == 0:
            assert rep not in got
            continue
        wsum = sum(ws[rid] * round(v * 1_000_000) for rid, v in rows)
        assert got[rep]["n_eff"] == n_eff
        assert got[rep]["mean"] == round(wsum / (n_eff * 1_000_000), 6), rep
    # the bootstrap distribution must actually vary across reps
    means = [r["mean"] for r in got.values()]
    assert len(set(means)) > 1


def test_poisson_bootstrap_grouped_and_seeded(spark):
    from aces_spark.datapipe.evalmetrics import poisson_bootstrap_means

    rows = [("a", i, 1.0) for i in range(20)] + [("b", i + 100, 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = poisson_bootstrap_means(df, "v", "id", n_reps=8, group_col="g").collect()
    # constant values within groups: every realized mean is the constant
    for r in got:
        assert r["mean"] == (1.0 if r["g"] == "a" else 5.0)
    # different seed -> different resample weights (n_eff profile changes)
    alt = poisson_bootstrap_means(df, "v", "id", n_reps=8, group_col="g", seed=1)
    a = {(r["g"], r["rep"]): r["n_eff"] for r in got}
    b = {(r["g"], r["rep"]): r["n_eff"] for r in alt.collect()}
    assert a != b


def test_hill_tail_index_pareto_recovery(spark):
    import math

    from aces_spark.datapipe.analytics import hill_tail_index

    # exact Pareto(alpha=2) quantile sample: x_q = (1-q)^(-1/2) on a
    # uniform grid -> Hill over the top k should recover ~2
    n, alpha = 4000, 2.0
    vals = [(1 - (i + 0.5) / n) ** (-1 / alpha) for i in range(n)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = hill_tail_index(df, "v", k=200).collect()[0]
    assert got["k"] == 200
    # manual reference with the same micro-nat snap
    top = sorted(vals, reverse=True)[:201]
    xref = top[200]
    lnsum = sum(math.floor(math.log(x / xref) * 1_000_000 + 0.5) for x in top[:200])
    assert got["lnsum_micronats"] == lnsum
    assert got["alpha"] == round(200 * 1_000_000 / lnsum, 6)
    assert abs(got["alpha"] - alpha) < 0.3


def test_hill_tail_index_guards(spark):
    from aces_spark.datapipe.analytics import hill_tail_index

    # fewer than k+1 positive values -> dropped
    small = spark.createDataFrame([(float(i),) for i in range(1, 5)], "v double")
    assert hill_tail_index(small, "v", k=10).collect() == []
    # all-equal top values -> zero log-sum -> dropped
    flat = spark.createDataFrame([(7.0,)] * 30, "v double")
    assert hill_tail_index(flat, "v", k=5).collect() == []
    # grouped: only the group with enough mass survives
    rows = [("big", 2.0 ** (i / 4)) for i in range(40)] + [("tiny", 9.9)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = hill_tail_index(df, "v", "g", k=8).collect()
    assert [r["g"] for r in got] == ["big"]
