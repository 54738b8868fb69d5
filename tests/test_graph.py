"""Tests for operators/graph.py: fixed-iteration integer PageRank."""

from __future__ import annotations

import pytest

from aces_spark.operators.graph import pagerank, pagerank_topk

SCALE = 10**12


def _reference_pagerank(edge_list, iterations=3, damping_pct=85, scale=SCALE):
    """Pure-python integer reference: same arithmetic contract."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    base = (100 - damping_pct) * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        new = {v: base for v in nodes}
        for s, d in edges:
            new[d] += (r[s] * damping_pct) // (100 * deg[s])
        r = new
    return r


def test_pagerank_matches_integer_reference(spark):
    raw = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("a", "b"),  # duplicate edge must collapse
        ("d", "a"),  # d is dangling-in only after this edge
    ]
    out = pagerank(spark.createDataFrame(raw, ["src", "dst"]), iterations=3)
    got = {row["node"]: row["rank_u"] for row in out.collect()}
    assert got == _reference_pagerank(raw)


def test_pagerank_dangling_node_keeps_teleport_only(spark):
    # b has no out-edges: its mass is dropped, it still gets the base.
    raw = [("a", "b")]
    out = pagerank(spark.createDataFrame(raw, ["src", "dst"]), iterations=2)
    got = {row["node"]: row["rank_u"] for row in out.collect()}
    ref = _reference_pagerank(raw, iterations=2)
    assert got == ref
    base = 15 * SCALE // (100 * 2)
    assert got["a"] == base  # nothing points at a after iteration 1


def test_pagerank_topk_order_and_ties(spark):
    # symmetric pair: identical ranks, tie broken by node id asc
    raw = [("x", "y"), ("y", "x")]
    rows = pagerank_topk(
        spark.createDataFrame(raw, ["src", "dst"]), k=2, iterations=3
    ).collect()
    assert [r["node"] for r in rows] == ["x", "y"]
    assert rows[0]["rank_u"] == rows[1]["rank_u"]


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)
    empty = df.filter("src = 'zzz'")
    with pytest.raises(ValueError):
        pagerank(empty)


def test_pagerank_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    plan = pagerank(
        df, iterations=1, checkpoint=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- triangle counting ---

import itertools
import random

from aces_spark.operators.graph import triangle_count


def _brute_triangles(edge_list):
    adj: dict = {}
    nodes = set()
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes |= {a, b}
    n = 0
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n += 1
    return n


def test_triangle_count_random_differential(spark):
    rng = random.Random(13)
    for _ in range(3):
        es = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(35)]
        es += [(b, a) for a, b in es[:8]]  # reversed dups must collapse
        df = spark.createDataFrame(es, "src long, dst long")
        got = triangle_count(df).collect()[0]["n_triangles"]
        assert got == _brute_triangles(es)


def test_triangle_count_k4_and_bipartite(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert (
        triangle_count(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()[0]["n_triangles"]
        == 4
    )
    bp = [(a, 100 + b) for a in range(5) for b in range(5)]
    assert (
        triangle_count(
            spark.createDataFrame(bp, "src long, dst long")
        ).collect()[0]["n_triangles"]
        == 0
    )


def test_triangle_count_ignores_self_loops(spark):
    es = [(1, 2), (2, 3), (1, 3), (2, 2)]
    got = triangle_count(
        spark.createDataFrame(es, "src long, dst long")
    ).collect()[0]["n_triangles"]
    assert got == 1


def test_triangle_count_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --- k-core ---

from aces_spark.operators.graph import k_core, k_core_peel


def _brute_kcore(edge_list, k):
    adj: dict = {}
    for a, b in set(map(lambda e: (min(e), max(e)), edge_list)):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(vs) for n, vs in adj.items()}


def test_k_core_matches_brute_force(spark):
    # K4 plus a pendant chain: 3-core is exactly the K4
    es = [(a, b) for a in range(4) for b in range(4) if a < b]
    es += [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(es, "src long, dst long")
    got = {r["node"]: r["deg"] for r in k_core(df, 3).collect()}
    assert got == _brute_kcore(es, 3) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_peel_converges_to_fixpoint(spark):
    # a path cascades under k=2: endpoints peel first, exposing new
    # endpoints each pass — the 2-core of a path is empty
    es = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(es, "src long, dst long")
    assert _brute_kcore(es, 2) == {}
    got = {r["node"]: r["deg"] for r in k_core_peel(df, 2, rounds=3).collect()}
    assert got == {}
    # one round only strips the two endpoints — not yet the fixpoint
    partial = {
        r["node"]: r["deg"] for r in k_core_peel(df, 2, rounds=1).collect()
    }
    assert set(partial) == {1, 2, 3, 4, 5}


def test_k_core_empty_when_k_too_high(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert k_core(df, 5).count() == 0


def test_k_core_validates(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_core_peel(df, 0)
    with _pytest.raises(ValueError):
        k_core_peel(df, 2, rounds=0)
    with _pytest.raises(ValueError):
        k_core(df, 0)


# --- personalized pagerank ---

from aces_spark.operators.graph import personalized_pagerank


def _reference_ppr(edge_list, seeds, iterations=3, damping_pct=85, scale=SCALE):
    """Pure-python integer reference with seed-concentrated teleport."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges} | set(seeds))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seeds = sorted(set(seeds))
    ns = len(seeds)
    init = scale // ns
    base = (100 - damping_pct) * scale // (100 * ns)
    r = {v: (init if v in seeds else 0) for v in nodes}
    for _ in range(iterations):
        new = {v: (base if v in seeds else 0) for v in nodes}
        for s, d in edges:
            new[d] += (r[s] * damping_pct) // (100 * deg[s])
        r = new
    return r


def test_ppr_matches_integer_reference(spark):
    raw = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
        ("a", "b"),  # duplicate edge must collapse
        ("d", "a"),
    ]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("a",)], ["node"])  # dup seed
    out = personalized_pagerank(edges, seeds, iterations=3)
    got = {row["node"]: row["rank_u"] for row in out.collect()}
    assert got == _reference_ppr(raw, ["a"])


def test_ppr_mass_concentrates_near_seeds(spark):
    # star out of s plus a far chain: the seed keeps the max rank and
    # rank decays monotonically with distance from the seed
    raw = [("s", "n1"), ("s", "n2"), ("n1", "far1"), ("far1", "far2")]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {
        r["node"]: r["rank_u"]
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }
    assert got == _reference_ppr(raw, ["s"], iterations=4)
    assert got["s"] == max(got.values())
    assert got["s"] > got["n1"] > got["far1"] > got["far2"]


def test_ppr_seed_outside_graph_still_gets_teleport(spark):
    raw = [("a", "b")]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    seeds = spark.createDataFrame([("z",)], ["node"])
    got = {
        r["node"]: r["rank_u"]
        for r in personalized_pagerank(edges, seeds, iterations=2).collect()
    }
    ref = _reference_ppr(raw, ["z"], iterations=2)
    assert got == ref
    # z has no in-edges: after the first pass it holds exactly the base
    assert got["z"] == 15 * SCALE // 100


def test_ppr_multi_seed_splits_teleport_evenly(spark):
    raw = [("a", "b"), ("b", "a")]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    got = {
        r["node"]: r["rank_u"]
        for r in personalized_pagerank(edges, seeds, iterations=3).collect()
    }
    assert got == _reference_ppr(raw, ["a", "b"])
    # symmetric graph + symmetric seeds -> identical ranks
    assert got["a"] == got["b"]


def test_ppr_validates_args(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        personalized_pagerank(edges, seeds, iterations=0)
    with _pytest.raises(ValueError):
        personalized_pagerank(edges, seeds, damping_pct=0)
    with _pytest.raises(ValueError):
        personalized_pagerank(edges, seeds.filter("node = 'zzz'"))


def test_ppr_plan_has_no_cartesian(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    plan = (
        personalized_pagerank(edges, seeds, iterations=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- label propagation ---

from aces_spark.operators.graph import label_propagation


def _ref_lpa(edge_list, iterations=2):
    """Pure-python synchronous LPA with (count desc, label asc) ties."""
    from collections import Counter

    adj: dict = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(lab[m] for m in nbrs)
            best = sorted(c.items(), key=lambda t: (-t[1], t[0]))[0][0]
            new[n] = best
        lab = new
    return lab


def test_lpa_matches_python_reference(spark):
    import random

    rng = random.Random(31)
    es = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(60)]
    df = spark.createDataFrame(es, "src long, dst long")
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _ref_lpa(es, iterations=iters)


def test_lpa_two_cliques_converge_to_two_communities(spark):
    # two K4s joined by one bridge edge: after 3 rounds each clique
    # carries its own minimum label
    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    es = k4a + k4b + [(3, 10)]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            spark.createDataFrame(es, "src long, dst long"), iterations=3
        ).collect()
    }
    assert got == _ref_lpa(es, iterations=3)
    labs_a = {got[n] for n in range(4)}
    labs_b = {got[n] for n in range(10, 14)}
    assert labs_a == {0} and labs_b == {10}


def test_lpa_validates_and_drops_self_loops(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        label_propagation(df, iterations=0)
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=2).collect()
    }
    assert got == _ref_lpa([(1, 1), (1, 2)], iterations=2)


def test_lpa_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = (
        label_propagation(df, iterations=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


class TestAdamicAdar:
    """Hand-computed golden for adamic_adar on the 5-edge house graph
    plus the hub-cap and min_common guards."""

    EDGES = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]

    def _df(self, spark):
        return spark.createDataFrame(self.EDGES, "src long, dst long")

    def test_scores_match_hand_computation(self, spark):
        import math

        from aces_spark.operators.graph import adamic_adar

        got = {
            (r["u"], r["v"]): (r["n_common"], r["score"])
            for r in adamic_adar(self._df(spark)).collect()
        }
        w2 = math.floor(1e6 / math.log(2) + 0.5) / 1e6  # deg-2 neighbor
        w3 = math.floor(1e6 / math.log(3) + 0.5) / 1e6  # deg-3 neighbor
        assert got == {
            (2, 3): (2, round(2 * w2, 6)),  # common {1, 4}, both deg 2
            (1, 4): (2, round(2 * w3, 6)),  # common {2, 3}, both deg 3
            (1, 2): (1, w3),
            (1, 3): (1, w3),
            (2, 4): (1, w3),
            (3, 4): (1, w3),
        }

    def test_max_degree_excludes_hubs(self, spark):
        from aces_spark.operators.graph import adamic_adar

        got = {
            (r["u"], r["v"]): r["n_common"]
            for r in adamic_adar(self._df(spark), max_degree=2).collect()
        }
        # only the deg-2 nodes (1 and 4) may serve as common neighbors
        assert got == {(2, 3): 2}

    def test_min_common_filters(self, spark):
        from aces_spark.operators.graph import adamic_adar

        got = {
            (r["u"], r["v"])
            for r in adamic_adar(self._df(spark), min_common=2).collect()
        }
        assert got == {(2, 3), (1, 4)}

    def test_reversed_duplicate_edges_collapse(self, spark):
        from aces_spark.operators.graph import adamic_adar

        doubled = spark.createDataFrame(
            self.EDGES + [(d, s) for s, d in self.EDGES] + [(5, 5)],
            "src long, dst long",
        )
        a = sorted(map(tuple, adamic_adar(self._df(spark)).collect()))
        b = sorted(map(tuple, adamic_adar(doubled).collect()))
        assert a == b
