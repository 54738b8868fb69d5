"""Round-7 ADVICE regression tests.

Pins the five advisor findings fixed this round:

1. ``winsorized_stats`` exact_div past 2^53 (decimal division, not double)
2. ``kmeans_clusters`` int64 coordinate-magnitude guard
3. ``semantic_dedup`` empty-corpus path (reachable, returns empty frame)
4. zero-norm vectors never flagged near-dups (NaN >= threshold trap)
5. ``rank_normalize`` non-identifier out_col + NULL value semantics
"""

from __future__ import annotations

import math
import random

import pytest

from aces_spark.datapipe.analytics import winsorized_stats
from aces_spark.datapipe.kmeans import kmeans_clusters, semantic_dedup
from aces_spark.datapipe.similarity import cosine_dup_pairs
from aces_spark.functions.features import rank_normalize


def _py_winsorized(values, lo_bp, hi_bp):
    ys = sorted(math.floor(v * 1_000_000 + 0.5) for v in values)
    n = len(ys)

    def bound(bp):
        pos_tt = (n - 1) * bp
        idx = pos_tt // 10000
        frac = pos_tt % 10000
        nxt = min(idx + 1, n - 1)
        return ys[idx] + ((ys[nxt] - ys[idx]) * frac) // 10000

    lo, hi = bound(lo_bp), bound(hi_bp)
    s = sum(min(max(y, lo), hi) for y in ys)
    mean_u = s // n if s >= 0 else -((-s) // n)
    return lo / 1e6, hi / 1e6, mean_u / 1e6


def test_winsorized_exact_div_past_2_53(spark):
    # value spans of ~1e8 raw units put (upper-lower)*frac well past
    # 2^53 in micro-units; the old double-division exact_div could be
    # off by one micro-unit there (the DuckDB oracle uses exact //)
    rng = random.Random(7)
    rows = []
    expect = {}
    for g in range(12):
        vals = [rng.uniform(-5e7, 5e7) for _ in range(rng.randint(2, 9))]
        rows += [(f"g{g}", v) for v in vals]
        expect[f"g{g}"] = _py_winsorized(vals, 3333, 7777)
    df = spark.createDataFrame(rows, "k string, value double")
    got = winsorized_stats(df, "k", lo_bp=3333, hi_bp=7777).collect()
    assert len(got) == 12
    for r in got:
        lo, hi, m = expect[r["k"]]
        assert (r["lo_bound"], r["hi_bound"], r["win_mean"]) == (lo, hi, m), r["k"]


def test_kmeans_coordinate_bound_raises(spark):
    dim = 4
    bound = math.isqrt((2**63 - 1) // (4 * dim))  # micro-units
    big = (bound + 10) / 1e6
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, big if i == 3 else 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exact-int64 bound"):
        kmeans_clusters(df, k=2, n_iters=1)
    # just inside the bound: no raise
    ok = spark.createDataFrame(
        [(i, [float(i), 1.0, -2.0, 0.5]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    assert kmeans_clusters(ok, k=2, n_iters=1).count() == 6


def test_semantic_dedup_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty, k=2)
    assert out.columns == ["vec_id", "cluster_id"]
    assert out.count() == 0


def test_zero_norm_vectors_not_near_dups(spark):
    # two zero vectors: cosine = 0/0 = NaN; Spark orders NaN above all
    # doubles, so an unguarded NaN >= threshold silently dropped one
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0]),
            (4, [1.0, 0.0, 1e-6]),
        ],
        "vec_id long, embedding array<double>",
    )
    kept = set(
        r["vec_id"] for r in semantic_dedup(df, k=1, threshold=0.95).collect()
    )
    assert {1, 2} <= kept  # zero vectors both survive
    assert 4 not in kept  # the real near-dup of 3 is dropped
    pairs = cosine_dup_pairs(
        df, threshold=0.95, n_cells=1, quantizer="seed"
    ).collect()
    assert {(p["vec_a"], p["vec_b"]) for p in pairs} == {(3, 4)}


def test_rank_normalize_weird_out_col_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0), ("a", 4, 20.0), ("b", 5, 9.0)],
        "grp string, rid long, v double",
    )
    # non-identifier out_col must not break the div expression
    got = {
        r["rid"]: r["pct bp"]
        for r in rank_normalize(df, "grp", "v", out_col="pct bp").collect()
    }
    # group a: 3 non-null values -> ranks 1,2,3 over n=3; null -> NULL
    assert got[1] == 0 and got[4] == 5000 and got[3] == 10000
    assert got[2] is None
    assert got[5] == 0  # singleton group pins to 0
