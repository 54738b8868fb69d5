"""Tests for datapipe/fuzzy.py: symmetric-delete fuzzy join."""

from __future__ import annotations

import random

import pytest

from aces_spark.datapipe.fuzzy import fuzzy_join, fuzzy_self_pairs


def _lev(a: str, b: str) -> int:
    """Classic Levenshtein DP (insert/delete/substitute, unit costs)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(words, k):
    ws = sorted(set(words))
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(ws)
        for b in ws[i + 1 :]
        if _lev(a, b) <= k
    }


def _rand_words(rng, n, maxlen=7, alphabet="abc"):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, maxlen)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k", [1, 2])
def test_self_pairs_match_brute_force(spark, k):
    rng = random.Random(7 + k)
    words = _rand_words(rng, 60)
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        (r["left_str"], r["right_str"], r["dist"])
        for r in fuzzy_self_pairs(df, "word", max_dist=k).collect()
    }
    assert got == _brute_pairs(words, k)


def test_cross_join_match_brute_force(spark):
    rng = random.Random(11)
    lw, rw = _rand_words(rng, 40), _rand_words(rng, 40)
    l = spark.createDataFrame([(w,) for w in lw], ["a"])
    r = spark.createDataFrame([(w,) for w in rw], ["b"])
    got = {
        (row["left_str"], row["right_str"], row["dist"])
        for row in fuzzy_join(l, r, "a", "b", max_dist=1).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a in set(lw)
        for b in set(rw)
        if _lev(a, b) <= 1
    }
    assert got == want


def test_empty_string_participates(spark):
    df = spark.createDataFrame([("",), ("a",), ("ab",), (None,)], ["word"])
    got = {
        (r["left_str"], r["right_str"], r["dist"])
        for r in fuzzy_self_pairs(df, "word", max_dist=1).collect()
    }
    assert got == {("", "a", 1), ("a", "ab", 1)}


def test_duplicate_values_collapse_to_one_pair(spark):
    df = spark.createDataFrame([("cat",), ("cat",), ("cot",)], ["word"])
    rows = fuzzy_self_pairs(df, "word", max_dist=1).collect()
    assert [(r["left_str"], r["right_str"], r["dist"]) for r in rows] == [
        ("cat", "cot", 1)
    ]


def test_validates_max_dist(spark):
    df = spark.createDataFrame([("x",)], ["word"])
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "word", max_dist=3)


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([("cat",), ("cot",)], ["word"])
    plan = (
        fuzzy_self_pairs(df, "word", max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_rejects_pathological_lengths(spark):
    """A 10 kB 'string' would explode to ~50M depth-2 delete variants —
    the length contract fails loudly instead (use shingles for long text)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from aces_spark.datapipe.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame([("ok",), ("x" * 600,)], "name string")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        fuzzy_self_pairs(df, "name").collect()
    # under the cap: still works
    ok = spark.createDataFrame([("ok",), ("oak",)], "name string")
    assert fuzzy_self_pairs(ok, "name").count() == 1


# ---------------------------------------------------------------------------
# resolve_entities: blocking -> match -> transitive closure -> canonical
# ---------------------------------------------------------------------------

from aces_spark.datapipe.fuzzy import resolve_entities


def test_resolve_entities_transitive_chain(spark):
    # cat~bat~bet chain must merge into ONE entity even though
    # levenshtein(cat, bet) = 2 > max_dist
    df = spark.createDataFrame(
        [("cat",), ("bat",), ("bet",), ("zebra",), ("dog",), ("dog",)],
        "value string",
    )
    got = {
        r["value"]: (r["entity_id"], r["entity_size"])
        for r in resolve_entities(df, "value").collect()
    }
    assert got == {
        "cat": ("bat", 3),
        "bat": ("bat", 3),
        "bet": ("bat", 3),
        "zebra": ("zebra", 1),
        "dog": ("dog", 1),
    }


def test_resolve_entities_python_differential(spark):
    import itertools
    import random

    rng = random.Random(3)
    base = ["alpha", "beta", "gamma", "delta", "omega"]
    vals = set(base)
    for w in base:  # deterministic 1-char perturbations
        for i in range(1, len(w)):
            if rng.random() < 0.5:
                vals.add(w[:i] + w[i + 1:])
    vals = sorted(vals)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    parent = {v: v for v in vals}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(vals, 2):
        if lev(a, b) <= 1:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for v in vals:
        groups.setdefault(find(v), []).append(v)
    expect = {
        v: (min(g), len(g)) for root, g in groups.items() for v in g
    }

    df = spark.createDataFrame([(v,) for v in vals], "value string")
    got = {
        r["value"]: (r["entity_id"], r["entity_size"])
        for r in resolve_entities(df, "value").collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs: blocking-window differential
# ---------------------------------------------------------------------------

from aces_spark.datapipe.fuzzy import sorted_neighborhood_pairs


def _py_snm(values, window, max_dist, prefix):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    blocks = {}
    for v in sorted(set(values)):
        blocks.setdefault(v[:prefix], []).append(v)
    out = set()
    for vs in blocks.values():
        for i, a in enumerate(vs):
            for b in vs[i + 1 : i + 1 + window]:
                d = lev(a, b)
                if d <= max_dist:
                    out.add((a, b, d))
    return out


def test_sorted_neighborhood_differential(spark):
    import random

    rng = random.Random(17)
    base = ["market", "martin", "marten", "garden", "gardon", "guards",
            "stream", "streams", "striker", "strike"]
    vals = list(base)
    for w in base:
        if rng.random() < 0.7:
            i = rng.randrange(1, len(w))
            vals.append(w[:i] + w[i + 1:])  # deletion typo, same first char
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    got = {
        (r["left_str"], r["right_str"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df, "value", window=3, max_dist=2, prefix=2
        ).collect()
    }
    assert got == _py_snm(vals, 3, 2, 2)
    assert got  # non-vacuous: the planted typos sort adjacent

    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "value", window=0)
