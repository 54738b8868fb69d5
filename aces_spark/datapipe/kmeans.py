"""Distributed k-means over an embedding column, engine-exact.

K-means is the workhorse behind the repo's IVF quantizers (where the
training loop is an internal detail of index build — ``similarity.py``);
here it is a FIRST-CLASS verified operator: deterministic seeding, a fixed
iteration count, and integer-exact arithmetic make every round — and the
final assignment — bit-identical across engines, so a DuckDB oracle can
hash-verify the whole trajectory by unrolling the rounds as CTEs (the
pagerank/BPE technique).

Determinism contract:

* Coordinates quantize once to integer micro-units
  (``floor(x·1e6 + 0.5)``, applied to the exact float→double widening),
  so squared distances are EXACT bigint sums — no float partial-sum
  order dependence.
* Seeding: the ``k`` vectors with the smallest
  ``(md5_long60(id), id)`` — the portable hash shuffle, not
  ``rand()``.
* Centroid update: per-dimension ``floor(sum/n + 0.5)`` where the
  division is bigint-as-double — IEEE division of identical inputs is
  identical in every engine, and the half-up floor snaps it integral.
* Ties in assignment break on ``(distance, centroid_id)``.

Scale shape (the MLlib pattern, not a join): each round collects the
k×dim centroid table to the driver (the sanctioned bounded hop — same
policy as the PQ codebook and IVF centroid loads) and inlines it as
PLAN LITERALS, so ASSIGNMENT IS MAP-ONLY — zero shuffle, zero row
amplification. Two designs were measured and rejected first: a
broadcast-centroid crossJoin + re-group shuffles the corpus
k-fold-amplified (pathological at 2M×32), and an ``array_min`` over
``transform``/``zip_with`` lambdas runs INTERPRETED with two array
allocations per (row, centroid) — 2k vectors/s at 2M×32×16. The
shipped form unrolls ``||v−c||² = ||v||² − 2·v·c + ||c||²`` into static
whole-stage-codegen arithmetic over ``element_at`` terms (``||v||²``
computed once per row, one literal dot product per centroid, ``||c||²``
folded to a constant) with an ``F.least`` struct argmin — same exact
bigint math, no allocations. The update step is one narrow
``(cluster, dim)``-keyed aggregate with map-side partials; per round
the corpus is scanned once and only k×dim partial rows move. A cluster
that loses every member simply disappears (standard empty-cluster
dropout; reseeding strategies are non-deterministic and out of
contract).

``k × dim`` is capped at 65,536 literal slots — beyond that the inline
literals bloat codegen; a corpus needing more cells wants the IVF
trainer (``similarity.py``), whose cell count scales with the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long60

__all__ = ["kmeans_clusters", "semantic_dedup"]

#: inline-literal budget: k*dim beyond this bloats the generated code
MAX_LITERAL_SLOTS = 65_536


def _assigned(quant: DataFrame, cent_rows) -> DataFrame:
    """Map-only assignment against inlined centroids, unrolled and
    FACTORED for whole-stage codegen: ``dist_c = ||v||² − 2·(v·c) +
    ||c||²`` with centroid coordinates as bigint literals and ``||c||²``
    constant-folded driver-side. The three stages live in SEPARATE
    projections (scalar coordinate columns → ``__vv`` + one dot column
    per centroid → ``F.least`` struct argmin): CollapseProject declines
    to inline a non-trivial alias referenced more than once, so ``__vv``
    and each coordinate are evaluated exactly once per row (one fused
    projection re-evaluated them k× — measured 2× slower, and the
    lambda-based ``zip_with``/``aggregate`` form ran INTERPRETED with two
    array allocations per (row, centroid): 150× slower at 2M×32×16).
    ``F.least`` over ascending-cid ``(dist, cid)`` structs is the
    lexicographic argmin with ties on the lowest centroid id. All terms
    are exact bigint arithmetic on the micro-unit coordinates —
    identical to the naive Σ(x−c)² expansion. Returns
    ``(vec_id, __qv, __cid, __dist)``."""
    cents = sorted(cent_rows)
    dim = len(cents[0][1])
    x = quant.select(
        "vec_id",
        "__qv",
        *[F.element_at("__qv", d + 1).alias(f"__x{d}") for d in range(dim)],
    )
    vv = None
    for d in range(dim):
        e = F.col(f"__x{d}")
        vv = e * e if vv is None else vv + e * e
    dots = []
    for cid, cv in cents:
        dot = None
        for d, c in enumerate(cv):
            term = F.col(f"__x{d}") * F.lit(int(c)).cast("long")
            dot = term if dot is None else dot + term
        dots.append(dot.alias(f"__dot{cid}"))
    x2 = x.select(
        "vec_id",
        "__qv",
        vv.alias("__vv"),
        *dots,
        *[F.col(f"__x{d}") for d in range(dim)],
    )
    structs = []
    for cid, cv in cents:
        cc = sum(int(c) * int(c) for c in cv)
        dist = (
            F.col("__vv")
            - F.lit(2).cast("long") * F.col(f"__dot{cid}")
            + F.lit(cc).cast("long")
        )
        structs.append(
            F.struct(dist.alias("dist"), F.lit(cid).cast("long").alias("cid"))
        )
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    return x2.select(
        "vec_id",
        "__qv",
        best["cid"].alias("__cid"),
        best["dist"].alias("__dist"),
        *[F.col(f"__x{d}") for d in range(dim)],
    )


def kmeans_clusters(
    vectors: DataFrame,
    k: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iters`` deterministic k-means rounds and return the final
    assignment ``(vec_id, cluster_id, dist_q)`` — ``dist_q`` the exact
    integer squared distance (micro-unit coordinates) to the assigned
    centroid. ``cluster_id`` numbers the seeds 1..k in seed-hash order.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    quant = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("__qv"),
    )
    # distributed top-k seed pick (TakeOrderedAndProject, never a global
    # single-partition window over the corpus); k rows land on the driver
    seed_rows = (
        quant.select(md5_long60(F.col("vec_id")).alias("__h"), "vec_id", "__qv")
        .orderBy("__h", "vec_id")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kmeans_clusters: input has no vectors")
    dim = len(seed_rows[0]["__qv"])
    if k * dim > MAX_LITERAL_SLOTS:
        raise ValueError(
            f"kmeans_clusters: k*dim = {k * dim} exceeds the inline-literal "
            f"budget ({MAX_LITERAL_SLOTS}); use the IVF trainer for large "
            "cell counts"
        )
    cent = [(i + 1, list(r["__qv"])) for i, r in enumerate(seed_rows)]

    for _ in range(n_iters):
        # wide-aggregate update: dim sums + a count per cluster in ONE
        # narrow k-group aggregate over the already-projected scalar
        # coordinate columns (a posexplode-to-long-format update pushed
        # n·dim generated rows through the shuffle — measured 2× slower
        # at 2M×32); k rows land on the driver (the bounded hop)
        dim = len(cent[0][1])
        rows = (
            _assigned(quant, cent)
            .groupBy("__cid")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(f"__x{d}").alias(f"__s{d}") for d in range(dim)],
            )
            .collect()
        )
        cent = [
            (
                r["__cid"],
                # float(sum) FIRST (the CAST-to-double in the SQL mirror),
                # then IEEE division — int/int true division would round
                # the exact quotient instead and can differ past 2^53
                [
                    int(math.floor(float(r[f"__s{d}"]) / r["__n"] + 0.5))
                    for d in range(dim)
                ],
            )
            for r in rows
        ]
    return _assigned(quant, cent).select(
        "vec_id",
        F.col("__cid").alias("cluster_id"),
        F.col("__dist").alias("dist_q"),
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means, then drop near-duplicates WITHIN each cluster — the
    cluster stage turns the quadratic all-pairs cosine into per-cluster
    work, the same linearization IVF gives ``cosine_dup_pairs`` but with
    the deterministic first-class trainer above. Keeps vector ``v``
    unless some ``u < v`` in the same cluster has
    ``cosine(u, v) >= threshold`` (the keep-lowest-id rule — exactly
    the repo's exact-dedup convention; the paper's keep-farthest-from-
    centroid variant is a one-column change). Returns the KEPT set
    ``(vec_id, cluster_id)``.

    Cosine is computed on the ORIGINAL float vectors (cast to double,
    sequential IEEE fold, 6-dp round — the ``cosine_dup_pairs``
    contract); clustering uses the integer micro-unit coordinates, so
    both stages are engine-exact and the whole pipeline unrolls into
    the k-means oracle plus one pair-pruning CTE. Norms are computed
    once per vector before the pair join (inside it they would be
    recomputed |pairs| times).
    """
    from .similarity import _dot, _norm

    assign = kmeans_clusters(vectors, k, n_iters, id_col, vec_col).select(
        "vec_id", "cluster_id"
    )
    v = (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .withColumn("__norm", _norm(F.col("__vec")))
        .join(assign, "vec_id")
    )
    a = v.select(
        "cluster_id",
        F.col("vec_id").alias("__ida"),
        F.col("__vec").alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = v.select(
        "cluster_id",
        F.col("vec_id").alias("__idb"),
        F.col("__vec").alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    sim = F.round(
        _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    dominated = (
        a.join(b, "cluster_id")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(sim >= threshold)
        .select(F.col("__idb").alias("vec_id"))
        .distinct()
    )
    return assign.join(dominated, "vec_id", "left_anti")
