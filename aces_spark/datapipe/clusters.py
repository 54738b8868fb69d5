"""Transitive near-duplicate cluster resolution (connected components).

Pairwise near-dup detectors (MinHash-LSH, SimHash, n-gram Jaccard) emit
EDGES; a real dedup pipeline needs the transitive closure — if A~B and
B~C, all three are one cluster even when (A, C) never surfaced as a pair.
This module computes connected components over a pair relation with the
alternating **large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): each round is a
constant number of groupBy/join passes keyed by node id, and the edge set
provably converges to one star per component (centered at the component's
minimum id) in O(log²) rounds — unlike naive label propagation, whose
round count is the graph DIAMETER (a 1M-link chain would need 1M rounds;
large-star collapses it in ~20).

Scale shape: every round shuffles on node id only (uniform keys — near-dup
graphs are overwhelmingly small components), `localCheckpoint` truncates
the iterative lineage each round so plans stay constant-size, and the
driver sees nothing but an (edge-count, edge-hash) signature per round for
the convergence test. No UDFs, no collect of node data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (lo, hi) with lo < v, self-loops dropped,
    distinct."""
    lo = F.least(F.col("a"), F.col("b"))
    hi = F.greatest(F.col("a"), F.col("b"))
    return (
        edges.filter(F.col("a") != F.col("b"))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both directions of every canonical edge: (u, v) ∪ (v, u)."""
    return edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _neighborhood_min(sym: DataFrame) -> DataFrame:
    """Per node u: m = min(Γ(u) ∪ {u})."""
    return sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given by ``pairs``.

    Returns ``(node, cluster_id)`` for every node that appears in at least
    one pair, where ``cluster_id`` is the minimum node id of its component.
    Callers attach singleton nodes with a left join (see
    :func:`dedup_clusters`).

    Raises ``RuntimeError`` if the edge set has not converged after
    ``max_iter`` alternating rounds (default 50 ≫ the O(log² n) bound for
    any realistic graph).
    """
    edges = _canonical(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint()

    prev_sig = None
    for _ in range(max_iter):
        # large-star: every neighbor v > u hooks to m = min(Γ(u) ∪ {u})
        sym = _symmetric(edges)
        large = (
            sym.join(_neighborhood_min(sym), "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        edges = _canonical(large).localCheckpoint()

        # small-star: neighbors v ≤ u (and u itself) hook to m
        sym = _symmetric(edges)
        nmin = _neighborhood_min(sym)
        small = (
            sym.join(nmin, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(nmin.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        edges = _canonical(small).localCheckpoint()

        # (count, xor-of-hashes) signature: order-independent, and xor —
        # unlike sum — cannot overflow under ANSI mode
        sig = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")

    # the converged edge set is a star per component; read labels as
    # min-over-neighborhood (robust even for the center itself)
    sym = _symmetric(edges)
    return sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("cluster_id")
    ).select(F.col("u").alias("node"), "cluster_id")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Assign every document its transitive near-dup cluster.

    Returns ``(doc_id, cluster_id, cluster_size)``: documents absent from
    ``pairs`` are singleton clusters of themselves. One extra shuffle on
    ``cluster_id`` computes sizes (uniform keys — components are small).
    """
    labels = connected_components(pairs, src, dst, max_iter)
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    with_labels = (
        base.join(labels, base["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return with_labels.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("long")
    )


def keep_best(
    clustered: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Canonical-document selection: keep the best-scoring document of each
    cluster (ties broken by minimum id — deterministic), dropping the rest.

    Input: one row per document with ``cluster_col`` and ``score_col``
    (e.g. :func:`dedup_clusters` joined with a quality score). Output: the
    surviving rows plus ``n_removed`` (documents dropped from the
    cluster). Both window functions share one partition spec, so this
    costs a single exchange on ``cluster_col``.
    """
    w_rank = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(cluster_col)
    return (
        clustered.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("n_removed", (F.count(F.lit(1)).over(w_all) - 1).cast("long"))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
