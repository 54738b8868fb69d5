"""Randomized differentials for the round-6 operators: each Spark
operator vs an independent pure-Python reference implementing the same
contract (seeded — deterministic across runs)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _py_winsorize(values, lo_bp, hi_bp):
    """Integer reference of winsorized_stats' contract: micro-unit
    values, ten-thousandths positions, truncating interpolation."""
    # floor(v*1e6 + 0.5) — identical to the operator's micro-unit snap
    ys = sorted(int((v * 1000000 + 0.5) // 1) for v in values)
    n = len(ys)

    def bound(bp):
        pos = (n - 1) * bp
        idx, frac = divmod(pos, 10000)
        nxt = min(idx + 1, n - 1)
        return ys[idx] + ((ys[nxt] - ys[idx]) * frac) // 10000

    lo, hi = bound(lo_bp), bound(hi_bp)
    s = sum(min(max(y, lo), hi) for y in ys)
    mean = s // n if s >= 0 else -((-s) // n)
    return n, lo / 1e6, hi / 1e6, mean / 1e6


def test_winsorize_random_differential(spark):
    from aces_spark.datapipe.analytics import winsorized_stats

    rng = random.Random(42)
    rows = []
    expected = {}
    for k in range(6):
        n = rng.randint(1, 40)
        vals = [round(rng.uniform(-50, 50), 4) for _ in range(n)]
        rows += [(k, v) for v in vals]
        expected[k] = _py_winsorize(vals, 500, 9500)
    df = spark.createDataFrame(rows, "k long, value double")
    got = {r["k"]: r for r in winsorized_stats(df, "k", lo_bp=500, hi_bp=9500).collect()}
    for k, (n, lo, hi, mean) in expected.items():
        r = got[k]
        assert r["n_points"] == n
        assert r["lo_bound"] == lo and r["hi_bound"] == hi, (k, r, expected[k])
        assert r["win_mean"] == mean, (k, r["win_mean"], mean)


def _py_greedy_coverage(doc_words, k):
    covered = set()
    picks = []
    remaining = dict(doc_words)
    for _ in range(k):
        best = None
        for doc_id in sorted(remaining):
            gain = len(remaining[doc_id] - covered)
            if gain >= 1 and (best is None or gain > best[1]):
                best = (doc_id, gain)
        if best is None:
            break
        picks.append(best)
        covered |= doc_words[best[0]]
    return picks


def test_greedy_coverage_random_differential(spark):
    from aces_spark.datapipe.selection import greedy_coverage_select

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    doc_words = {}
    for d in range(25):
        words = rng.sample(vocab, rng.randint(1, 12))
        rows.append((d, " ".join(words)))
        doc_words[d] = set(words)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = greedy_coverage_select(df, k=6)
    want = _py_greedy_coverage(doc_words, 6)
    assert got == want


def _py_containment(doc_shingles, threshold):
    out = {}
    docs = sorted(doc_shingles)
    for a in docs:
        for b in docs:
            if a == b or not doc_shingles[a]:
                continue
            inter = len(doc_shingles[a] & doc_shingles[b])
            if inter == 0:
                continue
            c = int(inter / len(doc_shingles[a]) * 10000 + 0.5) / 10000
            if c >= threshold:
                out[(a, b)] = c
    return out


def test_containment_random_differential(spark):
    from aces_spark.datapipe.dedup import containment_pairs, word_shingles

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(18)]
    rows = []
    for d in range(15):
        n = rng.randint(3, 20)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {}
    for r in word_shingles(df, n=3).collect():
        sh.setdefault(r["doc_id"], set()).add(r["shingle"])
    for d in range(15):
        sh.setdefault(d, set())
    want = _py_containment(sh, 0.3)
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, n=3, threshold=0.3, max_doc_freq=None).collect()
    }
    assert got == want


def test_hard_negatives_random_differential(spark):
    import math

    from aces_spark.datapipe.similarity import hard_negatives

    rng = random.Random(99)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)], rng.randint(0, 2))
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    queries = emb.filter(F.col("vec_id") < 4)
    got = {}
    for r in hard_negatives(emb, queries, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine_sim"]))

    by_id = {i: (v, l) for i, v, l in rows}
    for qid in range(4):
        qv, ql = by_id[qid]
        sims = []
        for nid, (nv, nl) in by_id.items():
            if nid == qid or nl == ql:
                continue
            dot = sum(a * b for a, b in zip(qv, nv))
            sim = round(dot / (math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(b * b for b in nv))), 6)
            sims.append((nid, sim))
        sims.sort(key=lambda t: (-t[1], t[0]))
        want = sims[:3]
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == want, (qid, got[qid], want)
