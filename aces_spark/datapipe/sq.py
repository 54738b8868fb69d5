"""Scalar (int8) quantization for embedding columns — the SQ sibling of
the product-quantization family (datapipe/pq.py): per-dimension affine
quantization to ``levels`` codes (default 256 = one byte), plus an
asymmetric-distance top-k that keeps query vectors full-precision and
dequantizes the corpus on the fly (the FAISS ``ScalarQuantizer`` /
``SQ8`` layout).

Why a 100 TB embedding corpus wants this next to PQ: SQ8 is 4× smaller
than float32 with near-exact recall and needs NO trained codebook —
"training" is a single per-dimension min/max pass, and min/max of
doubles is ORDER-FREE, so the bounds are engine-exact at any partition
count (unlike a mean, the usual distributed-float oracle-breaker).

Scale shape:
- ``sq8_bounds``: one narrow ``posexplode`` + min/max aggregate keyed on
  the dimension index (uniform keys, cardinality = dim, map-side
  partials). Output ≤ ``dim`` rows.
- ``sq8_encode``: the |dim|-row bounds table is a sanctioned bounded
  driver hop (the PQ-codebook / IVF-centroid pattern,
  pq.py:collect_codebook) baked back into the plan as LITERAL arrays —
  encode is MAP-ONLY, zero shuffle, however big the corpus.
- ``sq8_topk``: corpus dequantization is map-only on top of the stored
  codes; queries broadcast; the shared ``rank_topk`` epilogue keeps the
  determinism rule identical to every other ANN path.

Quantization rule (both engines evaluate the identical IEEE expression
tree, so codes are bit-deterministic):
    code = clamp(floor((x - lo) / (hi - lo) * (levels-1) + 0.5), 0, levels-1)
    xhat = lo + code / (levels-1) * (hi - lo)        # endpoints exact
A degenerate dimension (hi == lo) encodes as 0 and reconstructs lo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, rank_topk

__all__ = [
    "sq8_bounds",
    "collect_sq8_bounds",
    "sq8_encode",
    "sq8_dequantize",
    "sq8_topk",
]


def sq8_bounds(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``(dim, lo, hi)`` quantization bounds: ONE narrow
    posexplode + min/max aggregate. Exact and order-free — safe to
    compute once on a sample shard ONLY if that shard spans the value
    range; on the full corpus it is a single cheap pass."""
    d = vectors.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__dim", "__x")
    )
    return d.groupBy(F.col("__dim").cast("long").alias("dim")).agg(
        F.min("__x").alias("lo"), F.max("__x").alias("hi")
    )


def collect_sq8_bounds(bounds: DataFrame) -> tuple[list[float], list[float]]:
    """Bounded driver hop (≤ dim rows — the PQ-codebook pattern): pull
    the bounds table down so encode/dequantize can bake it into the plan
    as literal arrays and stay map-only."""
    rows = bounds.select("dim", "lo", "hi").collect()
    by_dim = {int(r["dim"]): (float(r["lo"]), float(r["hi"])) for r in rows}
    dims = sorted(by_dim)
    if dims != list(range(len(dims))):
        raise ValueError(f"sq8 bounds: non-contiguous dims {dims[:5]}...")
    lo = [by_dim[d][0] for d in dims]
    hi = [by_dim[d][1] for d in dims]
    return lo, hi


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_encode(
    vectors: DataFrame,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Encode ``(id, vector)`` → ``(id, codes array<int>)`` with the
    bounds baked in as literals: MAP-ONLY, zero shuffle. The affine
    floor is the IEEE-exact contract in the module docstring."""
    if levels < 2:
        raise ValueError("sq8_encode: need levels >= 2")
    lo_a, hi_a = _lit_arr(lo), _lit_arr(hi)
    top = levels - 1

    def enc(x: Column, i: Column) -> Column:
        l, h = F.get(lo_a, i), F.get(hi_a, i)
        raw = F.floor((x - l) / (h - l) * float(top) + 0.5).cast("long")
        return (
            F.when(h == l, F.lit(0))
            .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(top)))
            .cast("int")
        )

    return vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col).cast("array<double>"), enc).alias("codes"),
    )


def sq8_dequantize(
    codes: DataFrame,
    lo: list[float],
    hi: list[float],
    codes_col: str = "codes",
    out_col: str = "xhat",
    levels: int = 256,
) -> DataFrame:
    """Map-only reconstruction ``xhat = lo + code/(levels-1)*(hi-lo)``:
    endpoints reconstruct exactly; max error is half a cell width."""
    lo_a, hi_a = _lit_arr(lo), _lit_arr(hi)
    top = float(levels - 1)

    def deq(c: Column, i: Column) -> Column:
        l, h = F.get(lo_a, i), F.get(hi_a, i)
        return l + c.cast("double") / top * (h - l)

    return codes.withColumn(out_col, F.transform(F.col(codes_col), deq))


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Asymmetric-distance top-k over the SQ8-compressed corpus: queries
    stay full-precision, the corpus is encoded then dequantized on the
    fly (so the result is exactly what a stored-codes index would
    return). Broadcast queries × map-only dequantized corpus → shared
    ``rank_topk`` epilogue; score is the dot product at 6 dp (dot, not
    cosine: SQ changes vector norms, so the honest comparable is the
    inner product against the reconstruction)."""
    bounds = sq8_bounds(corpus, vec_col)
    lo, hi = collect_sq8_bounds(bounds)
    codes = sq8_encode(corpus, lo, hi, id_col, vec_col, levels)
    deq = sq8_dequantize(codes, lo, hi, levels=levels).select(
        F.col(id_col).alias("neighbor_id"), "xhat"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(deq)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("__qv"), F.col("xhat")), 6).alias("adc_dot"),
        )
    )
    return rank_topk(sims, k, "adc_dot")
