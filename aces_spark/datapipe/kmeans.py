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

``k × dim`` is capped at 4,096 literal slots: beyond that the generated
argmin source grows to megabytes, Janino compilation goes superlinear
(and at k=200·dim=32 crashed a default-heap driver), so the cap fails
fast with a pointer at the IVF trainer (``similarity.py``) — the right
tool for production cell counts, at the cost of the exact-integer
oracle contract this module exists to provide.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long60

__all__ = ["kmeans_clusters", "semantic_dedup"]

#: inline-literal budget (k·dim). The measured cliff: at k·dim ≈ 6400
#: (k=200, dim=32) the generated source for the argmin reaches ~2 MB and
#: Janino compilation degrades from seconds to minutes — and crashed the
#: driver JVM outright on a default heap. k·dim ≤ 4096 (e.g. 64 cells at
#: dim 64) stays comfortably inside whole-stage codegen; corpora needing
#: more cells want the MLlib IVF trainer (similarity.py), whose cell
#: count scales with the data and which this module's semantic_dedup
#: mirrors via cosine_dup_pairs(quantizer="kmeans").
MAX_LITERAL_SLOTS = 4_096

#: split factor for semantic_dedup's per-cluster pair join: an OVERSIZED
#: cluster's O(m²) pair block is cut ~this many ways by a deterministic
#: id-hash bucket on the dominated side (probe side replicated), so one
#: giant cluster — the SemDeDup imbalance mode — cannot serialize the
#: pair work onto a single task. Cost is replicating the probe side's
#: vectors ×this factor through the exchange for that cluster only —
#: keep it modest; raise for clusters in the 1e6+ range.
_PAIR_BUCKETS = 8

#: minimum observed cluster size before the pair join salts it (r10
#: verdict #1 — unconditional salting replicated one side 8× for EVERY
#: cluster, a permanent shuffle tax). Below this, a cluster's whole
#: m(m−1)/2 pair block is at most ~8M dot products — sub-second on one
#: core — so splitting buys nothing and the plain cluster_id key avoids
#: the replication entirely.
_SALT_MIN_CLUSTER = 4_096


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
    ``(vec_id, __cid, __dist, __x0..__x{dim-1})``."""
    cents = sorted(cent_rows)
    dim = len(cents[0][1])
    # expressions are built as SQL STRINGS and shipped through ONE
    # selectExpr per stage: composing them as Column objects costs one
    # py4j round-trip per node (~700 for k=4, dim=64 — measured 3.6 s of
    # pure DataFrame CONSTRUCTION per iteration before anything ran)
    x = quant.selectExpr(
        "vec_id",
        *[f"element_at(__qv, {d + 1}) AS __x{d}" for d in range(dim)],
    )
    vv_sql = " + ".join(f"__x{d} * __x{d}" for d in range(dim))
    x2 = x.selectExpr(
        "vec_id",
        f"{vv_sql} AS __vv",
        *[f"__x{d}" for d in range(dim)],
    )

    # STRUCT-FREE argmin: minimizing ``dist_c = ||v||² − 2·v·c + ||c||²``
    # is maximizing the scalar score ``s_c = 2·v·c − ||c||²``, so the
    # argmin is ``greatest`` over k plain bigint columns plus a
    # first-match CASE chain recovering the centroid id (first match ≡
    # lowest cid on ties — the documented tie-break). A least() over k
    # inlined (dist, cid) STRUCTS was measured 14× slower than the same
    # dots as plain scalar columns (per-row struct allocation + Least's
    # unsplittable codegen falls interpreted near k≈100); Greatest and
    # CaseWhen both split their generated code, so this shape stays in
    # whole-stage codegen at any k the literal budget admits. Each
    # __dot column is referenced twice (greatest + CASE), which also
    # stops CollapseProject from re-merging the dot projection into one
    # giant expression.
    dots = [
        " + ".join(f"__x{d} * {int(c)}L" for d, c in enumerate(cv))
        + f" AS __dot{cid}"
        for cid, cv in cents
    ]
    x3 = x2.selectExpr("vec_id", "__vv", *dots, *[f"__x{d}" for d in range(dim)])
    score = {
        cid: f"2L * __dot{cid} - {sum(int(c) * int(c) for c in cv)}L"
        for cid, cv in cents
    }
    best = (
        next(iter(score.values()))
        if len(cents) == 1
        else "greatest(" + ", ".join(score.values()) + ")"
    )
    x4 = x3.selectExpr("*", f"{best} AS __best")
    case = (
        "CASE "
        + " ".join(f"WHEN {score[cid]} = __best THEN {cid}L" for cid, _ in cents)
        + " END"
    )
    return x4.selectExpr(
        "vec_id",
        f"{case} AS __cid",
        "__vv - __best AS __dist",
        *[f"__x{d}" for d in range(dim)],
    )


def kmeans_clusters(
    vectors: DataFrame,
    k: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_registry: list | None = None,
) -> DataFrame:
    """Run ``n_iters`` deterministic k-means rounds and return the final
    assignment ``(vec_id, cluster_id, dist_q)`` — ``dist_q`` the exact
    integer squared distance (micro-unit coordinates) to the assigned
    centroid. ``cluster_id`` numbers the seeds 1..k in seed-hash order.

    ``cache_registry`` (the miners' contract, r11): when a list is
    passed, the quantized coordinate relation is persisted and appended
    to it, so the seed pick, every Lloyd update and the final assignment
    share ONE read+quantize pass instead of re-scanning the source per
    job (the MLlib KMeans cache-your-input discipline); the CALLER owns
    release. ``None`` keeps the scan-per-job shape.
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
    if cache_registry is not None:
        quant = quant.persist()
        cache_registry.append(quant)
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

    # coordinate-magnitude contract: every exact-bigint distance term
    # (Σx², 2·v·c, ||c||²) must stay inside int64 — non-ANSI Spark wraps
    # silently while the DuckDB oracle sums into HUGEINT, a silent
    # cross-engine divergence. All terms are bounded by 4·dim·m² for
    # m = max|quantized coord|, so require m ≤ isqrt(2^63 / (4·dim)).
    # The check piggybacks on round 1's update aggregate (one extra
    # max() column, no extra scan) and raises before any wrapped
    # centroid or assignment is returned.
    coord_bound = math.isqrt((2**63 - 1) // (4 * dim))

    for it in range(n_iters):
        # wide-aggregate update: dim sums + a count per cluster in ONE
        # narrow k-group aggregate over the already-projected scalar
        # coordinate columns (a posexplode-to-long-format update pushed
        # n·dim generated rows through the shuffle — measured 2× slower
        # at 2M×32); k rows land on the driver (the bounded hop)
        dim = len(cent[0][1])
        extra = (
            [
                F.max(
                    F.greatest(*[F.abs(F.col(f"__x{d}")) for d in range(dim)])
                    if dim > 1
                    else F.abs(F.col("__x0"))
                ).alias("__maxabs")
            ]
            if it == 0
            else []
        )
        rows = (
            _assigned(quant, cent)
            .groupBy("__cid")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(f"__x{d}").alias(f"__s{d}") for d in range(dim)],
                *extra,
            )
            .collect()
        )
        if it == 0:
            max_abs = max(r["__maxabs"] for r in rows)
            if max_abs > coord_bound:
                raise ValueError(
                    "kmeans_clusters: |quantized coordinate| "
                    f"{max_abs} exceeds the exact-int64 bound "
                    f"{coord_bound} for dim={dim} (raw |x| ≤ "
                    f"{coord_bound / 1e6:.1f}); rescale the embeddings "
                    "or use the MLlib IVF trainer (similarity.py)"
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


def _prune_cells_batched(
    vectors: DataFrame,
    assign: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """SemDeDup pair-pruning as one Arrow batch per cluster
    (``applyInPandas`` over ``cluster_id``): normalize the cell's m×dim
    block once, gram-matrix it in column chunks, and drop every vector
    some lower-id cellmate scores ≥ ``threshold`` against (cosine
    rounded to 6 dp — the :func:`semantic_dedup` rule). Zero-norm
    vectors are kept (no defined cosine, never dominate or dominated).

    Scale shape: work and memory are per-CELL (the quantizer's job is
    to keep cells ~target-bucket-sized), the gram matrix is chunked at
    {_PRUNE_CHUNK} columns so a hot cell costs m×{_PRUNE_CHUNK} doubles
    at a time, and the only exchange is the one groupBy on cluster_id.
    Returns the kept ``(vec_id, cluster_id)``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    src = (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .join(assign, "vec_id")
        .select("vec_id", "cluster_id", "__vec")
    )
    out_schema = T.StructType(
        [src.schema["vec_id"], src.schema["cluster_id"]]
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])[order]
        norms = np.linalg.norm(x, axis=1)
        nz = norms > 0
        xn = np.where(nz[:, None], x / np.maximum(norms, 1e-300)[:, None], 0.0)
        m = len(ids)
        dom = np.zeros(m, dtype=bool)
        for start in range(0, m, _PRUNE_CHUNK):
            stop = min(start + _PRUNE_CHUNK, m)
            sims = np.round(xn @ xn[start:stop].T, 6)
            lower = np.arange(m)[:, None] < np.arange(start, stop)[None, :]
            dom[start:stop] = ((sims >= threshold) & lower & nz[:, None]).any(axis=0)
        dom &= nz  # zero-norm columns are never dominated
        kept = order[~dom]
        return pd.DataFrame(
            {"vec_id": ids[order][~dom], "cluster_id": pdf["cluster_id"].to_numpy()[kept]}
        )

    return src.groupBy("cluster_id").applyInPandas(prune, out_schema)


#: column-chunk width for the per-cell gram matrix in
#: :func:`_prune_cells_batched` — bounds peak memory at m×chunk doubles
_PRUNE_CHUNK = 2_048


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "exact",
    centroids: DataFrame | None = None,
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
    sequential left-to-right IEEE sum, 6-dp round — the
    ``cosine_dup_pairs`` contract, here UNROLLED into static codegen
    arithmetic because the lambda fold runs interpreted and the pair
    join is the hot path); clustering uses the integer micro-unit
    coordinates, so both stages are engine-exact and the whole pipeline
    unrolls into the k-means oracle plus one pair-pruning CTE. Norms
    are computed once per vector before the pair join (inside it they
    would be recomputed |pairs| times), and the assignment relation is
    lineage-truncated before the self-join — without it Catalyst plans
    the entire k-means trajectory into BOTH join branches (measured 20 s
    → ~2 s at sf0.1).

    ``quantizer`` picks the clustering stage — the SAME pair-pruning
    runs downstream of either:

    * ``"exact"`` (default): the deterministic trainer above —
      oracle-able, capped at k·dim ≤ {MAX_LITERAL_SLOTS} literal slots.
    * ``"ivf"``: the MLlib-trained IVF coarse quantizer
      (``similarity.kmeans_centroids`` + the Arrow-batched matmul
      ``assign_cells_batched``, then per-cell numpy gram pruning via
      ``_prune_cells_batched``) — UNCAPPED cell counts, the production
      path for real SemDeDup runs where k is in the tens of thousands
      (``n_iters`` is the trainer's maxIter there). Parity with "exact"
      whenever both quantizers induce the same grouping (pinned at k=1
      and on separated clusters in ``tests/test_kmeans.py``); recall at
      k ≥ 256 is measured by ``tools/semdedup_probe.py``.

    ``centroids`` (ivf arm only): a pre-trained ``(cell_id, centroid)``
    frame to use INSTEAD of training — the production reuse-the-
    quantizer shape (train once on a reference sample, dedup many
    corpus increments against the same cell geometry), and what lets
    ``tools/sf10_probe.py`` hand the exact same centroid matrix to its
    independent numpy reference.
    """
    from .similarity import _norm

    # empty-corpus check BEFORE the trainer: kmeans_clusters eagerly
    # collects seeds and raises "input has no vectors", so a post-hoc
    # guard would be dead code — return the empty assignment shape here
    head = vectors.select(vec_col).first()
    if head is None:
        return vectors.select(
            F.col(id_col).alias("vec_id"),
            F.lit(0).cast("long").alias("cluster_id"),
        ).limit(0)
    dim = len(head[0])
    # truncate ONCE here: assign feeds both the pair join (via v) and the
    # final anti-join — un-checkpointed, the whole clustering trajectory
    # evaluates twice
    if quantizer == "exact":
        # cache_registry: the trainer's quantized coordinates back the
        # seed/update jobs AND the assign checkpoint's materialization —
        # one read+quantize pass; LRU / the caller's clearCache owns
        # release (the classifier pattern)
        assign = kmeans_clusters(
            vectors, k, n_iters, id_col, vec_col, cache_registry=[]
        ).select("vec_id", "cluster_id")
    elif quantizer == "ivf":
        if centroids is not None:
            from .similarity import assign_cells_batched, collect_centroid_rows

            assign = assign_cells_batched(
                vectors, collect_centroid_rows(centroids), id_col, vec_col
            ).select("vec_id", F.col("cell_id").cast("long").alias("cluster_id"))
        elif k == 1:
            # MLlib KMeans requires k >= 2; one cell needs no trainer
            assign = vectors.select(
                F.col(id_col).alias("vec_id"),
                F.lit(0).cast("long").alias("cluster_id"),
            )
        else:
            from .similarity import (
                assign_cells_batched,
                collect_centroid_rows,
                kmeans_centroids,
            )

            cents = kmeans_centroids(
                vectors, k=k, id_col=id_col, vec_col=vec_col, max_iter=max(1, n_iters)
            )
            # k×dim centroid rows to the driver (the sanctioned bounded
            # hop), then map-only Arrow-batched matmul assignment — the
            # crossJoin-scoring assign_cells ran the interpreted cosine
            # fold k times per vector (measured ~6 min at 220k×256×32 vs
            # seconds for the batched matmul)
            assign = assign_cells_batched(
                vectors, collect_centroid_rows(cents), id_col, vec_col
            ).select("vec_id", F.col("cell_id").cast("long").alias("cluster_id"))
    else:
        raise ValueError(
            f"unknown quantizer {quantizer!r} (expected 'exact' or 'ivf')"
        )
    assign = assign.localCheckpoint(eager=False)
    if quantizer == "ivf":
        # per-cell numpy gram matrix instead of the relational pair
        # join: the join materializes O(Σ m_c²) rows that are 2·dim
        # scalar columns wide through the SMJ (measured ~130 s of the
        # 145 s probe at 220k×256×32), while applyInPandas hands each
        # cell to BLAS once — Xn·Xnᵀ over an ~m×dim block, column j
        # dominated iff any row with a smaller vec_id scores
        # ≥ threshold. Same keep-lowest-id rule, cosine rounded 6 dp;
        # this arm trades the exact branch's bit-exact oracle contract
        # for uncapped k — which is the point of the ivf variant.
        return _prune_cells_batched(
            vectors, assign, threshold, id_col, vec_col
        )
    # zero-norm vectors have no defined cosine (0/0 → NaN, which Spark
    # orders ABOVE every double, so NaN >= threshold would silently mark
    # every zero-vector pair a near-dup) — they can never dominate or be
    # dominated, so exclude them from the pair join entirely
    v = (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .withColumn("__norm", _norm(F.col("__vec")))
        .filter(F.col("__norm") > 0)
        .join(assign, "vec_id")
        .localCheckpoint(eager=False)
    )
    # coordinates flatten to scalar columns BEFORE the pair join (once
    # per vector, not per pair): element_at inside the post-join
    # projection ran 5× slower than this shape at 1M pairs — per-pair
    # array access does not codegen into tight arithmetic the way plain
    # scalar columns do (the kmeans factoring lesson, applied to a
    # self-join). The dot is then one left-to-right scalar sum —
    # identical addition order to the _dot lambda fold and DuckDB's
    # list_dot_product. Expression strings, not Column composition
    # (py4j round-trip per node).
    a_cols = [f"element_at(__vec, {d + 1}) AS __a{d}" for d in range(dim)]
    b_cols = [f"element_at(__vec, {d + 1}) AS __b{d}" for d in range(dim)]
    # salt the per-cluster self-join (guide §2.5): joining on cluster_id
    # alone gives the exchange only k distinct keys, so a small k (or one
    # giant cluster — the SemDeDup imbalance mode) serializes the O(m²)
    # pair work onto a handful of tasks. Bucketing the dominated side by
    # a deterministic id hash and replicating the probe side across the
    # buckets splits an oversized cluster's pair block ~_PAIR_BUCKETS
    # ways. The salt is CONDITIONAL on observed cluster size (r10 verdict
    # #1 — the unconditional form taxed every cluster 8× probe-side
    # replication): a tiny per-cluster count aggregate (narrow key-only
    # rows, map-side partials, k-row result) broadcast-joins back, and a
    # cluster only buckets when its pair block is big enough to matter —
    # small clusters keep bucket count 1, i.e. the plain cluster_id key.
    # Both sides derive the bucket count from the same broadcast row, so
    # every pair still lands in exactly one bucket — identical pairs,
    # identical results.
    sizes = v.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__csz"))
    v2 = v.join(F.broadcast(sizes), "cluster_id")
    nbkt = (
        f"CASE WHEN __csz >= {_SALT_MIN_CLUSTER}L THEN {_PAIR_BUCKETS}L "
        "ELSE 1L END"
    )
    va = v2.selectExpr(
        "cluster_id",
        "vec_id AS __ida",
        "__norm AS __na",
        f"{nbkt} AS __nbkt",
        *a_cols,
    ).selectExpr(
        "cluster_id",
        "__ida",
        "__na",
        "explode(sequence(0L, __nbkt - 1L)) AS __bkt",
        *[f"__a{d}" for d in range(dim)],
    )
    vb = v2.selectExpr(
        "cluster_id",
        "vec_id AS __idb",
        "__norm AS __nb",
        f"pmod(xxhash64(vec_id), {nbkt}) AS __bkt",
        *b_cols,
    )
    dot_sql = " + ".join(f"__a{d} * __b{d}" for d in range(dim))
    dominated = (
        va.join(vb, ["cluster_id", "__bkt"])
        .filter(F.col("__ida") < F.col("__idb"))
        .selectExpr(
            "__idb", f"round(({dot_sql}) / (__na * __nb), 6) AS __sim"
        )
        .filter(F.col("__sim") >= threshold)
        .select(F.col("__idb").alias("vec_id"))
        .distinct()
    )
    return assign.join(dominated, "vec_id", "left_anti")
