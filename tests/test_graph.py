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
