"""MMR diversified selection: brute-force differential + the diversity
property itself."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _vectors(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos_u(a, b):
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na * nb <= 0:
        return None
    return math.floor(sum(x * y for x, y in zip(a, b)) / (na * nb) * 1_000_000 + 0.5)


def _ref_mmr(data, qid, k, pool, lam_num=7, lam_den=10):
    """Pure-Python reference of the integer greedy."""
    rel = sorted(
        ((_cos_u(data[qid], v), -i) for i, v in data.items() if i != qid),
        reverse=True,
    )[:pool]
    cand = [(-ni, r) for r, ni in rel]
    picks = [cand[0][0]]
    while len(picks) < k and len(picks) < len(cand):
        best = None
        for cid, r in cand:
            if cid in picks:
                continue
            maxsim = max(_cos_u(data[cid], data[s]) for s in picks)
            score = lam_num * r - (lam_den - lam_num) * maxsim
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid)
        picks.append(best[1])
    return picks


class TestMMR:
    def test_matches_python_reference_greedy(self, spark):
        from aces_spark.datapipe.selection import mmr_select

        rng = random.Random(11)
        rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(30)]
        data = dict(rows)
        got = mmr_select(_vectors(spark, rows), _vectors(spark, rows[:2]), k=4, pool=8)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        for qid in (0, 1):
            want = _ref_mmr(data, qid, k=4, pool=8)
            assert [n for _, n in sorted(by_q[qid])] == want

    def test_diversifies_across_clusters(self, spark):
        """Two tight clusters; the query sits in cluster A. Pure top-2 is
        two A docs; MMR's second pick must come from cluster B."""
        from aces_spark.datapipe.selection import mmr_select

        # A-cluster: relevance 0.9 to the query, mutual similarity 1.0
        # (scaled copies). B: relevance 0.6, similarity 0.54 to A. At
        # λ=0.5 the second A doc scores 0.45 − 0.5 = −0.05 while B scores
        # 0.30 − 0.27 = +0.03 — the textbook diversification flip. (A
        # near-dup at relevance ≈ 1.0 would STILL beat any alternative:
        # λ·1 − (1−λ)·1 = 0 ≥ λ·relB − (1−λ)·simAB whenever relB ≤ simAB,
        # which cos geometry forces when A ≈ query.)
        a = [0.9, 0.43588989435406733, 0.0]
        b = [0.6, 0.0, 0.8]
        rows = [
            (0, [1.0, 0.0, 0.0]),        # query
            (1, [x * 1.0 for x in a]),
            (2, [x * 0.9 for x in a]),
            (3, [x * 1.1 for x in a]),
            (10, [x * 1.0 for x in b]),
            (11, [x * 0.9 for x in b]),
        ]
        got = mmr_select(
            _vectors(spark, rows),
            _vectors(spark, rows[:1]),
            k=2,
            pool=5,
            lam_num=5,
            lam_den=10,
        ).collect()
        picks = {r["rank"]: r["neighbor_id"] for r in got}
        assert picks[1] in (1, 2, 3)
        assert picks[2] in (10, 11)

    def test_lambda_one_reduces_to_relevance_ranking(self, spark):
        from aces_spark.datapipe.selection import mmr_select
        from aces_spark.datapipe.similarity import brute_force_topk

        rng = random.Random(5)
        rows = [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(20)]
        vecs = _vectors(spark, rows)
        q = vecs.filter(F.col("vec_id") == 0)
        got = sorted(
            (r["rank"], r["neighbor_id"])
            for r in mmr_select(vecs, q, k=3, pool=6, lam_num=10, lam_den=10).collect()
        )
        want = brute_force_topk(vecs, q, k=3).collect()
        # brute_force rounds to 6dp; the integer greedy snaps to micro —
        # same grid, so the orderings agree
        assert [n for _, n in got] == [r["neighbor_id"] for r in want]

    def test_validation(self, spark):
        from aces_spark.datapipe.selection import mmr_select

        v = _vectors(spark, [(0, [1.0])])
        with pytest.raises(ValueError):
            mmr_select(v, v, k=0)
        with pytest.raises(ValueError):
            mmr_select(v, v, k=5, pool=3)
        with pytest.raises(ValueError):
            mmr_select(v, v, k=1, pool=1, lam_num=0)

    def test_short_pool_stops_early(self, spark):
        from aces_spark.datapipe.selection import mmr_select

        rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.5, 0.5])]
        got = mmr_select(
            _vectors(spark, rows), _vectors(spark, rows[:1]), k=3, pool=3
        ).collect()
        # only 2 candidates exist for the query -> only 2 ranks emitted
        assert sorted(r["rank"] for r in got) == [1, 2]
