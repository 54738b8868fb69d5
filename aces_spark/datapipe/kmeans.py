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

Scale shape: the assignment step is |vectors| × k rows of array math
against a BROADCAST k-row centroid relation (zip_with/aggregate stay in
whole-stage codegen); the update step is a (cluster, dim)-keyed aggregate
with map-side partials. Each round's centroid relation is
``localCheckpoint(eager=False)``-truncated so round r+1's plan does not
replay round r's cross join. A cluster that loses every member simply
disappears (standard empty-cluster dropout; reseeding strategies are
non-deterministic and out of contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long60

__all__ = ["kmeans_clusters"]


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x)


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
    # single-partition window over the corpus), then rank the k survivors
    seeds = (
        quant.select(md5_long60(F.col("vec_id")).alias("__h"), "vec_id", "__qv")
        .orderBy("__h", "vec_id")
        .limit(k)
    )
    # the row_number window runs over the k-row seed frame only — cheap
    cent = seeds.select(
        F.row_number()
        .over(Window.orderBy("__h", "vec_id"))
        .cast("long")
        .alias("__cid"),
        F.col("__qv").alias("__cv"),
    )

    def _assign(c):
        scored = quant.crossJoin(F.broadcast(c)).select(
            "vec_id",
            "__qv",
            "__cid",
            _sq_dist(F.col("__qv"), F.col("__cv")).alias("__dist"),
        )
        return (
            # first(__qv) is safe: __qv is functionally dependent on vec_id
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("__dist", "__cid")).alias("__best"), F.first("__qv").alias("__qv"))
            .select("vec_id", "__qv", F.col("__best.__cid").alias("__cid"), F.col("__best.__dist").alias("__dist"))
        )

    for _ in range(n_iters):
        assigned = _assign(cent)
        per_dim = assigned.select(
            "__cid", F.posexplode("__qv").alias("__d", "__x")
        ).groupBy("__cid", "__d").agg(
            F.floor(F.sum("__x").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long")
            .alias("__c")
        )
        cent = (
            per_dim.groupBy("__cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__d", "__c"))),
                    lambda s: s["__c"],
                ).alias("__cv")
            )
            .localCheckpoint(eager=False)
        )
    final = _assign(cent)
    return final.select(
        "vec_id",
        F.col("__cid").alias("cluster_id"),
        F.col("__dist").alias("dist_q"),
    )
