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

from ..functions.litfast import array_lit
from .similarity import _dot, rank_topk

__all__ = [
    "sq8_bounds",
    "collect_sq8_bounds",
    "sq8_encode",
    "sq8_dequantize",
    "sq8_topk",
    "binary_codes",
    "hamming_topk",
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
    # array_lit: one JVM parse, not one py4j round-trip per element
    return array_lit([float(v) for v in vals])


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
    floor is the IEEE-exact contract in the module docstring.

    Hot-path shape: TWO ``zip_with`` passes (subtract lo, then scale by
    the precomputed range) — O(d) per row. The obvious alternative, a
    ``transform`` lambda indexing literal lo/hi arrays by position, is
    O(d²) per row (each indexed access rebuilds the d-literal array in
    codegen) — measured 2× slower at 2M×64 and catastrophically worse
    on the query side of :func:`sq8_topk`."""
    if levels < 2:
        raise ValueError("sq8_encode: need levels >= 2")
    top = levels - 1
    rng = [h - l for l, h in zip(lo, hi)]  # IEEE-exact: same op the SQL does
    sub = F.zip_with(
        F.col(vec_col).cast("array<double>"), _lit_arr(lo), lambda x, l: x - l
    )
    codes = F.zip_with(
        sub,
        _lit_arr(rng),
        lambda d, r: F.when(r == 0, F.lit(0))
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(d / r * float(top) + 0.5).cast("long"), F.lit(0)
                ),
                F.lit(top),
            )
        )
        .cast("int"),
    )
    return vectors.select(F.col(id_col), codes.alias("codes"))


def sq8_dequantize(
    codes: DataFrame,
    lo: list[float],
    hi: list[float],
    codes_col: str = "codes",
    out_col: str = "xhat",
    levels: int = 256,
) -> DataFrame:
    """Map-only reconstruction ``xhat = lo + code/(levels-1)*(hi-lo)``:
    endpoints reconstruct exactly; max error is half a cell width.
    Same O(d) two-``zip_with`` shape as :func:`sq8_encode`."""
    top = float(levels - 1)
    rng = [h - l for l, h in zip(lo, hi)]
    scaled = F.zip_with(
        F.col(codes_col), _lit_arr(rng), lambda c, r: c.cast("double") / top * r
    )
    xhat = F.zip_with(scaled, _lit_arr(lo), lambda t, l: l + t)
    return codes.withColumn(out_col, xhat)


def _adc_query_side(
    queries: DataFrame,
    lo: list[float],
    scale: list[float],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-query ADC precomputation: ``(query_id, __qs_u, __kq_u)`` with
    ``__qs_u[d] = floor(q_d·s_d·1e6 + 0.5)`` (long) and ``__kq_u`` the
    micro-unit snap of the sequential-fold dot ``Σ q_d·lo_d``. All the
    float work in the operator happens HERE, on the |queries| rows; from
    this point the score is pure int64 arithmetic."""
    qv = F.col(vec_col).cast("array<double>")
    qs_u = F.zip_with(
        qv,
        _lit_arr(scale),
        lambda x, s: F.floor(x * s * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
    )
    kq_u = F.floor(_dot(qv, _lit_arr(lo)) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    return queries.select(
        F.col(id_col).alias("query_id"),
        qs_u.alias("__qs_u"),
        kq_u.alias("__kq_u"),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
    impl: str = "column",
) -> DataFrame:
    """Asymmetric-distance top-k over the SQ8-compressed corpus: queries
    stay full-precision, the corpus stays CODES — the dequantized dot is
    computed in its factored ADC form
    ``dot(q, xhat) = Σ_d q_d·lo_d + Σ_d (q_d·s_d)·code_d`` with
    ``s_d = (hi_d−lo_d)/(levels−1)`` (the FAISS ADC table trick,
    collapsed to the inner-product case). The per-query terms are
    snapped to INTEGER micro-units first (``_adc_query_side``), so the
    pair score ``kq_u + Σ qs_u[d]·code[d]`` is an exact int64 sum —
    ORDER-FREE, hence bit-identical across the column path, the batched
    numpy path, and the SQL oracle (the repo's micro-unit discipline;
    a float fold here would have pinned evaluation order forever).
    ``adc_dot`` is that integer over 1e6 — exact 6-dp semantics by
    construction. Dot, not cosine: SQ changes norms, so the honest
    comparable is the inner product against the reconstruction.

    ``impl="column"`` (default, the oracle path): broadcast queries ×
    codes with an unrolled integer multiply-add per pair. Fine at
    bench scale; at 32M pairs the per-pair array reads above the BNLJ
    evaluate outside whole-stage codegen (measured 92–157 s at 16
    queries × 2M×64 — the naive dequantize-then-dot form was 210 s).

    ``impl="batched"`` (the 100 TB path): ONE Arrow-batched int64
    matmul per corpus batch against the collected query table (bounded
    driver hop — queries are broadcast-small by contract, capped), with
    per-batch top-k pruning under the same (score desc, id asc) rule —
    the corpus-sized pair relation never exists; only ≤ |queries|·k
    candidate rows per batch reach the shared ``rank_topk`` epilogue.
    Exact int64 ⇒ result is BIT-IDENTICAL to the column path (pytest
    parity-pinned), unlike the BLAS float paths that are honestly
    bench-only elsewhere."""
    if impl not in ("column", "batched"):
        raise ValueError(f"sq8_topk: unknown impl {impl!r}")
    top = float(levels - 1)
    bounds = sq8_bounds(corpus, vec_col)
    lo, hi = collect_sq8_bounds(bounds)
    scale = [(h - l) / top for l, h in zip(lo, hi)]  # IEEE-exact per dim
    codes = sq8_encode(corpus, lo, hi, id_col, vec_col, levels).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = _adc_query_side(queries, lo, scale, id_col, vec_col)
    if impl == "batched":
        sims = _sq8_sims_batched(codes, q, k)
    else:
        sims = _sq8_sims_column(codes, q, len(lo))
    return rank_topk(sims, k, "adc_dot")


def _sq8_sims_column(codes: DataFrame, q: DataFrame, dim: int) -> DataFrame:
    """Pure-Column pair scores: broadcast-BNLJ + unrolled int64
    multiply-add (≤256 dims; the interpreted HOF fold beyond — measured
    slower than the unroll in the rank path, faster under aggregates:
    both are far from the batched path, which is why that exists)."""
    if dim <= 256:
        adc_u = F.lit(0).cast("long")
        for i in range(1, dim + 1):
            adc_u = adc_u + F.element_at("__qs_u", i) * F.element_at(
                "codes", i
            ).cast("long")
    else:
        adc_u = F.aggregate(
            F.zip_with(
                F.col("__qs_u"), F.col("codes"), lambda x, c: x * c.cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    return (
        F.broadcast(q)
        .crossJoin(codes)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            ((F.col("__kq_u") + adc_u).cast("double") / 1000000.0).alias(
                "adc_dot"
            ),
        )
    )


_BATCHED_MAX_QUERIES = 100_000


def _sq8_sims_batched(codes: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Arrow-batched candidate generation: int64 matmul (exact — no
    float-order caveat) + per-batch top-k prune. Emits ≤ |queries|·k
    rows per batch, so the downstream rank window is candidate-sized
    however big the corpus."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = q.collect()  # bounded: queries are broadcast-small by contract
    if len(q_rows) > _BATCHED_MAX_QUERIES:
        raise ValueError(
            f"sq8_topk(impl='batched'): {len(q_rows)} queries exceed the "
            f"{_BATCHED_MAX_QUERIES} broadcast-side cap — the query side "
            "must be the small side; swap roles or shard the queries"
        )
    qids = [r["query_id"] for r in q_rows]
    qmat = np.asarray([r["__qs_u"] for r in q_rows], dtype=np.int64)  # nq×d
    kq = np.asarray([r["__kq_u"] for r in q_rows], dtype=np.int64)

    id_field = codes.schema["neighbor_id"]
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_field.dataType, id_field.nullable),
            id_field,
            T.StructField("adc_u", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # B×d
            scores = cmat @ qmat.T + kq[None, :]  # B×nq, exact int64
            out = []
            for j, qid in enumerate(qids):
                dfj = pd.DataFrame(
                    {"neighbor_id": pdf["neighbor_id"], "adc_u": scores[:, j]}
                )
                dfj = dfj[dfj["neighbor_id"] != qid]
                dfj = dfj.sort_values(
                    ["adc_u", "neighbor_id"],
                    ascending=[False, True],
                    kind="mergesort",
                ).head(k)
                dfj.insert(0, "query_id", qid)
                out.append(dfj)
            if out:
                yield pd.concat(out, ignore_index=True)

    cand = codes.mapInPandas(run, out_schema)
    return cand.select(
        "query_id",
        "neighbor_id",
        (F.col("adc_u").cast("double") / 1000000.0).alias("adc_dot"),
    )


_MIN_LONG = -9223372036854775808


def _sign_bits(vec: Column, dim: int) -> Column:
    """``array<long>`` of ceil(dim/64) words; bit i of word w is set iff
    coordinate 64w+i is strictly positive. Built by a PLAN-TIME python
    loop over constant indices — ``F.get(vec, <int literal>)`` is O(1)
    in codegen, where a runtime ``transform`` lambda indexing a literal
    bit table would pay the sq8_encode O(d^2) trap."""
    words = []
    for w in range((dim + 63) // 64):
        bits = None
        for i in range(64):
            d = w * 64 + i
            if d >= dim:
                break
            bit = _MIN_LONG if i == 63 else (1 << i)
            term = F.when(F.get(vec, d) > 0, F.lit(bit)).otherwise(F.lit(0))
            bits = term if bits is None else bits.bitwiseOR(term)
        words.append(bits.cast("long"))
    return F.array(*words)


def binary_codes(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary (sign-bit) quantization: ``(id, codes array<long>)`` with
    one bit per dimension — 32x smaller than float32, the compression
    end-point of the SQ8 -> PQ -> binary ladder. Hamming distance between
    sign codes is a monotone proxy for angular distance (the classic
    sign-random-projection/LSH result; here the "projection" is the
    identity because embedding coordinates are already roughly centered
    — callers with biased dimensions should center first).

    Map-only, ZERO shuffle, and exact-integer output: bit i of word w =
    ``coord[64w+i] > 0`` (zero counts as negative, documented). ``dim``
    is required and capped at 1024 so the unrolled expression stays
    inside codegen limits (16 words = 1024 when-branches).
    """
    if not 1 <= dim <= 1024:
        raise ValueError("binary_codes: dim must be in [1, 1024]")
    v = F.col(vec_col).cast("array<double>")
    return vectors.select(F.col(id_col), _sign_bits(v, dim).alias("codes"))


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k under binary-code Hamming distance — the
    32x-compressed ANN baseline: encode both sides with
    :func:`binary_codes`, distance = popcount of the XOR, rank with the
    shared deterministic tie rule (distance ASC, id ASC). Output
    ``(query_id, neighbor_id, hamming)``; self-matches excluded.

    Scale shape: corpus encoded map-only; the bounded query side is
    broadcast; per pair the distance is ceil(dim/64) XOR+popcount ops on
    longs — JVM-intrinsic, ~50x less arithmetic than the float dot it
    approximates. At 100 TB this is the cheap first pass that feeds an
    exact float rerank (compose with ``similarity.rank_topk`` over the
    survivors), exactly the FAISS binary-index pattern.
    """
    if k < 1:
        raise ValueError("hamming_topk: k must be >= 1")
    n_words = (dim + 63) // 64
    c = binary_codes(corpus, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("codes").alias("__cc")
    )
    q = binary_codes(queries, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("__qc")
    )
    dist = None
    for w in range(n_words):
        term = F.bit_count(
            F.get(F.col("__cc"), w).bitwiseXOR(F.get(F.col("__qc"), w))
        )
        dist = term if dist is None else dist + term
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sims = pairs.select(
        "query_id", "neighbor_id", dist.cast("long").alias("hamming")
    )
    return rank_topk(sims, k, "hamming", ascending=True)
