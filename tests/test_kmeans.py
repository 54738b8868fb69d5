"""kmeans_clusters (datapipe/kmeans.py) — pure-Python differential over
randomized vectors plus determinism/edge checks."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from aces_spark.datapipe.kmeans import kmeans_clusters


def _h60(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _quant(v):
    return [math.floor(x * 1_000_000 + 0.5) for x in v]


def _py_kmeans(rows, k, n_iters):
    quant = {vid: _quant(v) for vid, v in rows}
    seeds = sorted(quant, key=lambda i: (_h60(i), i))[:k]
    cent = {c + 1: quant[vid] for c, vid in enumerate(seeds)}

    def assign(cent):
        out = {}
        for vid, qv in quant.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
                for cid, cv in cent.items()
            )
            out[vid] = best  # (dist, cid)
        return out

    for _ in range(n_iters):
        a = assign(cent)
        groups = {}
        for vid, (_, cid) in a.items():
            groups.setdefault(cid, []).append(quant[vid])
        cent = {
            cid: [
                math.floor(sum(col) / len(vs) + 0.5)
                for col in zip(*vs)
            ]
            for cid, vs in groups.items()
        }
    a = assign(cent)
    return sorted((vid, cid, dist) for vid, (dist, cid) in a.items())


def test_kmeans_differential(spark):
    rng = random.Random(7)
    # three planted blobs + noise, float32-ish rounding applied upstream
    rows = []
    for i in range(90):
        center = [(-0.4, 0.4), (0.3, -0.2), (0.0, 0.1)][i % 3]
        rows.append(
            (
                i,
                [
                    round(center[j % 2] + rng.uniform(-0.05, 0.05), 6)
                    for j in range(8)
                ],
            )
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["vec_id"], r["cluster_id"], r["dist_q"])
        for r in kmeans_clusters(df, k=3, n_iters=2, vec_col="embedding").collect()
    )
    assert got == _py_kmeans(rows, 3, 2)


def test_kmeans_single_cluster_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "vec_id long, embedding array<double>"
    )
    out = kmeans_clusters(df, k=1, n_iters=1).collect()
    assert sorted(r["cluster_id"] for r in out) == [1, 1]
    with pytest.raises(ValueError):
        kmeans_clusters(df, k=0)
    with pytest.raises(ValueError):
        kmeans_clusters(df, k=2, n_iters=0)


# ---------------------------------------------------------------------------
# semantic_dedup: cluster-then-prune (SemDeDup), python differential
# ---------------------------------------------------------------------------

from aces_spark.datapipe.kmeans import semantic_dedup


def _py_semantic_dedup(rows, k, n_iters, threshold):
    assigns = _py_kmeans(rows, k, n_iters)  # [(vid, cid, dist)]
    cid_of = {vid: cid for vid, cid, _ in assigns}
    vecs = dict(rows)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    ids = sorted(vecs)
    dominated = set()
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            if cid_of[u] == cid_of[v] and cos(vecs[u], vecs[v]) >= threshold:
                dominated.add(v)
    return sorted((vid, cid_of[vid]) for vid in ids if vid not in dominated)


def test_semantic_dedup_differential(spark):
    rng = random.Random(11)
    rows = []
    for i in range(60):
        center = [(-0.4, 0.4), (0.3, -0.2), (0.0, 0.1)][i % 3]
        rows.append(
            (i, [round(center[j % 2] + rng.uniform(-0.08, 0.08), 6) for j in range(6)])
        )
    # planted exact near-dups: every 7th vector reappears barely perturbed
    for i in range(0, 60, 7):
        rows.append((1000 + i, [round(x + 1e-4, 6) for x in rows[i][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in semantic_dedup(df, k=3, n_iters=2, threshold=0.999).collect()
    )
    expect = _py_semantic_dedup(rows, 3, 2, 0.999)
    assert got == expect
    # the planted copies share a cluster with their original and cosine
    # ~1.0, so each pair must have lost exactly its higher id
    kept = {v for v, _ in got}
    for i in range(0, 60, 7):
        assert i in kept and (1000 + i) not in kept


def test_semantic_dedup_ivf_parity(spark):
    """quantizer='ivf' (MLlib coarse quantizer, uncapped k) must agree
    with the exact trainer whenever both induce the same grouping:
    trivially at k=1, and at k=2 on well-separated blobs."""
    import random

    from aces_spark.datapipe.kmeans import semantic_dedup

    rng = random.Random(3)
    rows = []
    for i in range(60):
        base = [10.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 10.0, 0.0, 0.0]
        rows.append((i, [x + rng.uniform(-1, 1) for x in base]))
    rows.append((100, [x * 1.0001 for x in rows[0][1]]))  # near-dup of 0
    rows.append((101, [x * 1.0002 for x in rows[1][1]]))  # near-dup of 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for k in (1, 2):
        exact = sorted(
            r["vec_id"]
            for r in semantic_dedup(df, k=k, threshold=0.9999).collect()
        )
        ivf = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                df, k=k, threshold=0.9999, quantizer="ivf"
            ).collect()
        )
        assert exact == ivf, f"k={k}"
        assert 100 not in exact and 101 not in exact
    with pytest.raises(ValueError, match="quantizer"):
        semantic_dedup(df, quantizer="nope")


def test_semantic_dedup_salt_gate_exact(spark, monkeypatch):
    """The conditional pair-join salt (r11) must not change the kept set:
    forcing every cluster above the gate (salted, 8 buckets) and every
    cluster below it (plain cluster_id key) must agree pair-for-pair."""
    import random

    import aces_spark.datapipe.kmeans as km

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    # planted near-dups so the kept set is non-trivial either way
    for i in range(0, 40, 5):
        rows.append((500 + i, [x * 1.0001 for x in rows[i][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    monkeypatch.setattr(km, "_SALT_MIN_CLUSTER", 1)  # everything salted
    salted = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in km.semantic_dedup(df, k=3, threshold=0.999).collect()
    )
    monkeypatch.setattr(km, "_SALT_MIN_CLUSTER", 10**9)  # nothing salted
    plain = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in km.semantic_dedup(df, k=3, threshold=0.999).collect()
    )
    assert salted == plain
    # at least one planted dup must have been dropped in both runs
    assert len(salted) < len(rows)
