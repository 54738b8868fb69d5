"""Tests for event-stream analytics: funnels, retention, quantiles."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.analytics import cohort_retention, funnel, length_quantiles

BASE = datetime(2024, 1, 1)


def _ev(uid, minutes, etype):
    return (uid, BASE + timedelta(minutes=minutes), etype)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1 completes the funnel in order
        _ev(1, 0, "view"), _ev(1, 10, "click"), _ev(1, 20, "purchase"),
        # user 2: purchase BEFORE click → only 2 steps (view, click)
        _ev(2, 0, "view"), _ev(2, 5, "purchase"), _ev(2, 10, "click"),
        # user 3: starts mid-funnel → 0 steps completed (no view)
        _ev(3, 0, "click"), _ev(3, 5, "purchase"),
        # user 4: view only
        _ev(4, 0, "view"),
        # user 5: no funnel events at all → absent from output
        _ev(5, 0, "error"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_sequential_order(events):
    out = {r["user_id"]: r for r in funnel(events, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_steps"] == 3
    assert out[1]["step3_purchase_ts"] == BASE + timedelta(minutes=20)
    # user 2's purchase precedes the click → chain stops at click
    assert out[2]["n_steps"] == 2
    assert out[2]["step3_purchase_ts"] is None
    assert out[3]["n_steps"] == 0
    assert out[4]["n_steps"] == 1


def test_funnel_same_timestamp_not_consecutive(spark):
    """Two steps at the identical timestamp cannot both count (strict
    order), but a later event can still continue the chain."""
    rows = [
        (1, BASE, "view"), (1, BASE, "click"), (1, BASE + timedelta(minutes=1), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel(ev, ["view", "click"]).collect()[0]
    assert out["n_steps"] == 2
    assert out["step2_click_ts"] == BASE + timedelta(minutes=1)


def test_funnel_greedy_earliest(spark):
    """The chain picks the earliest valid event per step."""
    rows = [
        (1, BASE, "view"), (1, BASE + timedelta(minutes=1), "view"),
        (1, BASE + timedelta(minutes=2), "click"), (1, BASE + timedelta(minutes=3), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel(ev, ["view", "click"]).collect()[0]
    assert out["step1_view_ts"] == BASE
    assert out["step2_click_ts"] == BASE + timedelta(minutes=2)


def test_funnel_ntz_timestamps(spark):
    rows = [(1, BASE, "view"), (1, BASE + timedelta(minutes=1), "click")]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    assert funnel(ev, ["view", "click"]).collect()[0]["n_steps"] == 2


def _funnel_reference(events_by_user, steps):
    """Driver-side reference: greedy-earliest sequential chain."""
    out = {}
    for uid, evs in events_by_user.items():
        evs = sorted(e for e in evs if e[1] in steps)
        chain = [None] * len(steps)
        for ts, et in evs:
            for i, s in enumerate(steps):
                if chain[i] is None and et == s and (i == 0 or (chain[i - 1] is not None and ts > chain[i - 1])):
                    chain[i] = ts
                    break
        if evs:
            out[uid] = tuple(chain)
    return out


def test_funnel_randomized_differential(spark):
    """The array-fold funnel matches a straightforward Python reference on
    randomized event streams (seeded grid, repeated step names included)."""
    import random

    steps = ["a", "b", "a"]
    for seed in range(6):
        rng = random.Random(seed)
        by_user = {}
        rows = []
        for uid in range(12):
            evs = []
            for _ in range(rng.randrange(0, 14)):
                ts = BASE + timedelta(minutes=rng.randrange(0, 30))
                et = rng.choice(["a", "b", "c"])
                evs.append((ts, et))
                rows.append((uid, ts, et))
            by_user[uid] = evs
        if not rows:
            continue
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        got = {
            r["user_id"]: (r["step1_a_ts"], r["step2_b_ts"], r["step3_a_ts"])
            for r in funnel(df, steps).collect()
        }
        want = _funnel_reference(by_user, steps)
        assert got == want, f"seed={seed}"


def test_cohort_retention(spark):
    rows = [
        # user 1 first seen day 0, active day 0 and day 8 (periods 0 and 1)
        (1, BASE, "x"), (1, BASE + timedelta(days=8), "x"),
        # user 2 first seen day 0 only
        (2, BASE + timedelta(hours=3), "x"),
        # user 3 first seen day 7, active day 7 + day 15 (periods 0 and 1)
        (3, BASE + timedelta(days=7), "x"), (3, BASE + timedelta(days=15), "x"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {(str(r["cohort_day"]), r["period"]): r["n_active"] for r in cohort_retention(ev).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert out[("2024-01-08", 1)] == 1


def test_length_quantiles(spark):
    rows = [(i, "s", float(v)) for i, v in enumerate([1, 3, 7, 9, 20, 21, 40])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    out = length_quantiles(df, probs=[0.25, 0.5, 0.99]).collect()[0]
    assert out["q_0_25"] == 5.0 and out["q_0_5"] == 9.0
    assert out["q_0_99"] == 38.86
    # global variant
    g = length_quantiles(df, by=None, probs=[0.5]).collect()[0]
    assert g["q_0_5"] == 9.0


def test_key_skew_stats(spark):
    rows = [(k, i) for k, n in [("a", 8), ("b", 2), ("c", 2)] for i in range(n)]
    df = spark.createDataFrame(rows, "k string, i long")
    from aces_spark.datapipe.analytics import key_skew_stats

    r = key_skew_stats(df, "k").collect()[0]
    assert r["n_keys"] == 3 and r["n_rows"] == 12 and r["max_rows"] == 8
    assert r["mean_rows"] == 4.0
    assert r["p50_rows"] == 2.0
    assert r["skew_ratio"] == 2.0


def test_heavy_keys_order_and_frac(spark):
    rows = [(k, i) for k, n in [("a", 6), ("b", 3), ("c", 1)] for i in range(n)]
    df = spark.createDataFrame(rows, "k string, i long")
    from aces_spark.datapipe.analytics import heavy_keys

    got = [(r["k"], r["n_rows"], r["row_frac"]) for r in heavy_keys(df, "k", 2).collect()]
    assert got == [("a", 6, 0.6), ("b", 3, 0.3)]


def test_event_type_pivot(spark):
    rows = [(1, "click"), (1, "click"), (1, "view"), (2, "purchase")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    from aces_spark.datapipe.analytics import event_type_pivot

    got = {
        r["user_id"]: (r["n_click"], r["n_view"], r["n_purchase"])
        for r in event_type_pivot(df, ["click", "view", "purchase"]).collect()
    }
    assert got == {1: (2, 1, 0), 2: (0, 0, 1)}


def test_event_type_pivot_absent_type_zero_schema_stable(spark):
    df = spark.createDataFrame([(1, "click")], "user_id long, event_type string")
    from aces_spark.datapipe.analytics import event_type_pivot

    out = event_type_pivot(df, ["click", "view"])
    assert out.columns == ["user_id", "n_click", "n_view"]
    assert out.collect()[0]["n_view"] == 0


def test_char_entropy_hand_computed(spark):
    import math

    from aces_spark.datapipe.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    # uniform single char -> 0; two chars 50/50 -> ln 2; four distinct -> ln 4
    assert got[1]["entropy_nats"] == 0.0
    assert abs(got[2]["entropy_nats"] - math.log(2)) < 1e-5
    assert abs(got[3]["entropy_nats"] - math.log(4)) < 1e-5
    # empty doc: no characters -> no row from the explode (documented)
    assert 4 not in got
    assert got[3]["n_chars"] == 4


def test_char_entropy_partition_invariant(spark):
    from aces_spark.datapipe.text import char_entropy

    df = spark.createDataFrame(
        [(i, "the quick brown fox " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    one = {tuple(r) for r in char_entropy(df.coalesce(1)).collect()}
    many = {tuple(r) for r in char_entropy(df.repartition(5)).collect()}
    assert one == many


# --- association rules ---


def _brute_rules(rows, cap=50, min_pairs=1):
    """Pure-python reference of the documented integer contract."""
    from collections import Counter

    cnt = Counter(rows)  # (key, item) -> multiplicity
    per_key: dict = {}
    for (k, i), c in cnt.items():
        per_key.setdefault(k, []).append((i, c))
    capped = set()
    for k, items in per_key.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for i, _ in items[:cap]:
            capped.add((k, i))
    n_keys = len({k for k, _ in capped})
    n_item = Counter(i for _, i in capped)
    both = Counter()
    for k in {k for k, _ in capped}:
        items = sorted(i for kk, i in capped if kk == k)
        for a in items:
            for b in items:
                if a != b:
                    both[(a, b)] += 1

    def hup(n, d):  # round-half-up at basis points, integer-exact
        return ((2 * n * 10000 + d) // (2 * d)) / 10000.0

    out = {}
    for (a, b), nb in both.items():
        if nb < min_pairs:
            continue
        na, nc = n_item[a], n_item[b]
        out[(a, b)] = (
            nb, na, nc, n_keys,
            hup(nb, n_keys), hup(nb, na), hup(nb * n_keys, na * nc),
        )
    return out


def test_association_rules_match_brute_force(spark):
    import random

    from aces_spark.datapipe.analytics import association_rules

    rng = random.Random(23)
    rows = [
        (rng.randint(0, 9), f"i{rng.randint(0, 7)}") for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_antecedent"], r["n_consequent"], r["n_keys"],
            r["support"], r["confidence"], r["lift"],
        )
        for r in association_rules(df, "user_id", "item").collect()
    }
    assert got == _brute_rules(rows)


def test_association_rules_cap_and_min_pairs(spark):
    from aces_spark.datapipe.analytics import association_rules

    # key 1 touches a,b,c; cap=2 keeps its two most frequent (a x2, b x1 —
    # c loses the count-desc/item-asc tie-break against b)
    rows = [
        (1, "a"), (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {
        (r["antecedent"], r["consequent"]): r["n_both"]
        for r in association_rules(df, "user_id", "item", max_items_per_key=2).collect()
    }
    assert got == {k: v[0] for k, v in _brute_rules(rows, cap=2).items()}
    assert ("a", "c") in got and got[("a", "c")] == 1  # key 3 only

    # min_pairs prunes singles
    got2 = {
        (r["antecedent"], r["consequent"]): r["n_both"]
        for r in association_rules(
            df, "user_id", "item", max_items_per_key=2, min_pairs=2
        ).collect()
    }
    assert got2 == {("a", "b"): 2, ("b", "a"): 2}


def test_association_rules_lift_direction_symmetric(spark):
    from aces_spark.datapipe.analytics import association_rules

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x")]
    df = spark.createDataFrame(rows, "user_id long, item string")
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "user_id", "item").collect()
    }
    # lift is symmetric; confidence is not
    assert rules[("x", "y")]["lift"] == rules[("y", "x")]["lift"]
    assert rules[("x", "y")]["confidence"] < rules[("y", "x")]["confidence"]


def test_association_rules_plan_no_cartesian(spark):
    from aces_spark.datapipe.analytics import association_rules

    df = spark.createDataFrame([(1, "a"), (1, "b")], "user_id long, item string")
    plan = (
        association_rules(df, "user_id", "item")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
