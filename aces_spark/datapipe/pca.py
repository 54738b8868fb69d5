"""Distributed covariance and PCA whitening for embedding columns — the
preprocessing step in front of semantic dedup and retrieval (SemDeDup
and the sentence-embedding literature both whiten / PCA-reduce before
cosine work; FAISS's OPQ/PCAMatrix is the same object).

Two halves, split by what each engine can verify:

* :func:`embedding_covariance` — EXACT integer covariance moments. Each
  coordinate is fixed-pointed to micro-units (``floor(x·1e6 + 0.5)`` —
  half-up, identical in numpy/Spark/DuckDB), and the d×d moment matrix
  accumulates int64 partial Gram blocks per Arrow batch; partials sum
  exactly in DECIMAL(38,0). Deterministic at any partition count and
  cross-engine → a full value-hash oracle entry.

* :func:`pca_whiten` — the float half: driver-side ``numpy.linalg.eigh``
  of the d×d covariance (d is small by construction; the DATA is what's
  big), then a map-only JVM projection of every embedding onto the top
  ``n_components`` eigenvectors with per-component 1/√λ scaling.
  Eigenvector sign/order are pinned (descending λ, first nonzero
  component positive) so output is deterministic, but BLAS float sums
  are not bit-contracted cross-engine — verified by pytest invariants
  (whitened covariance ≈ I, reconstruction) rather than a SQL oracle.

Scale shape: one corpus pass emitting ``batches × d(d+1)/2`` tiny
partial rows into a single (i, j)-keyed exchange — the classic
tree-aggregated Gram. The projection is a literal-matrix expression:
zero exchanges, no UDF on the serve path.

Overflow audit: |x| < 100 → |u| < 1e8; u_i·u_j < 1e16; int64 partials
safe to ~920 rows/batch at that extreme (typical unit-norm
embeddings: |u| ≤ 1e6, ~4.6e6 rows/batch). The chunk size is derived
per batch from the observed max |u| (rows × umax² ≤ 2^62, capped at
``_MAX_BATCH_ROWS``), so the int64 Gram partial can never wrap for any
input range; the DECIMAL(38,0) final sum is exact regardless.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_covariance", "pca_fit", "pca_whiten", "projection_expr"]

SCALE = 1_000_000
_DEC = "decimal(38,0)"

# Upper bound on rows per int64 Gram chunk; the actual chunk size is
# derived per Arrow batch from the observed max |u| so that
# rows × umax² ≤ 2^62 (int64-safe with 2× headroom) for ANY coordinate
# range, not just unit-norm embeddings.
_MAX_BATCH_ROWS = 8192
_INT64_BUDGET = 1 << 62


def _safe_chunk_rows(umax: int) -> int:
    """Largest chunk length whose int64 Gram partial cannot wrap.

    Each Gram entry sums ``rows`` products bounded by ``umax²``; keeping
    ``rows × umax² ≤ 2^62`` leaves a 2× margin under int64. Always at
    least 1 (a single product |u_i·u_j| ≤ 1e16·… only wraps if a single
    coordinate exceeds ~2.1e9, i.e. |x| > ~2147 — rejected below).
    """
    if umax <= 1:
        return _MAX_BATCH_ROWS
    return max(1, min(_MAX_BATCH_ROWS, _INT64_BUDGET // (umax * umax)))


def embedding_covariance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle exact covariance moments of the embedding matrix.

    Output, one row per dimension pair ``i <= j`` (1-based):
    ``(i, j, n, sum_ui, sum_uj, sum_uiuj, cov_q)`` where ``u`` is the
    micro-unit fixed-point coordinate and
    ``cov_q = trunc((n·Σu_iu_j − Σu_i·Σu_j) / n²)`` — the population
    covariance in micro² units, truncate-divided exactly (DECIMAL
    arithmetic end-to-end; Spark ``div`` and DuckDB ``//`` both
    truncate toward zero, so the same at any scale and in any engine).
    """
    import numpy as np
    import pandas as pd

    src = df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())
    probe = src.first()  # sanctioned 1-row hop: dimension discovery
    if probe is None:
        raise ValueError("embedding_covariance: no non-null embeddings")
    d = len(probe["v"])

    def partial_grams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arr = np.stack(pdf["v"].to_numpy())
            u_all = np.floor(arr.astype(np.float64) * SCALE + 0.5).astype(np.int64)
            umax = int(np.abs(u_all).max(initial=0))
            if umax * umax > _INT64_BUDGET:  # |x| beyond ~2.1e3: a single
                raise ValueError(  # product would wrap int64
                    f"embedding_covariance: coordinate magnitude {umax / SCALE}"
                    " exceeds the int64-exact range (~2147)"
                )
            step = _safe_chunk_rows(umax)
            for lo in range(0, u_all.shape[0], step):
                u = u_all[lo : lo + step]
                g = u.T @ u  # d×d int64, exact within the derived chunk
                s = u.sum(axis=0)
                iu, ju = np.triu_indices(d)
                yield pd.DataFrame(
                    {
                        "i": (iu + 1).astype(np.int64),
                        "j": (ju + 1).astype(np.int64),
                        "pn": np.int64(u.shape[0]),
                        "psum_i": s[iu],
                        "psum_j": s[ju],
                        "pgram": g[iu, ju],
                    }
                )

    partials = src.mapInPandas(
        partial_grams,
        "i long, j long, pn long, psum_i long, psum_j long, pgram long",
    )
    agg = partials.groupBy("i", "j").agg(
        # each (i, j) group sees every batch exactly once, so summing
        # the per-batch partials reconstructs the full moments
        F.sum("pn").cast("long").alias("n"),
        F.sum(F.col("psum_i").cast(_DEC)).cast(_DEC).alias("sum_ui"),
        F.sum(F.col("psum_j").cast(_DEC)).cast(_DEC).alias("sum_uj"),
        F.sum(F.col("pgram").cast(_DEC)).cast(_DEC).alias("sum_uiuj"),
    )
    return agg.select(
        "i",
        "j",
        "n",
        F.col("sum_ui").cast("long").alias("sum_ui"),
        F.col("sum_uj").cast("long").alias("sum_uj"),
        F.col("sum_uiuj").cast("long").alias("sum_uiuj"),
        # truncate-toward-zero division on a possibly negative
        # numerator: Spark's div and DuckDB's // both truncate
        # (verified: -7//2 = -3 in DuckDB, INT and HUGEINT alike)
        F.expr(
            f"cast((cast(n as {_DEC}) * sum_uiuj - sum_ui * sum_uj)"
            f" div (cast(n as {_DEC}) * cast(n as {_DEC})) as long)"
        ).alias("cov_q"),
    )


def pca_fit(
    df: DataFrame,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-9,
    whiten: bool = True,
    return_values: bool = False,
):
    """Fit the PCA projection and return it driver-side as plain floats:
    ``(mean[d], w[d][k])`` with ``projected = (x - mean) @ w``. The
    covariance comes from :func:`embedding_covariance` (exact integers),
    the eigendecomposition is the sanctioned bounded d×d driver hop,
    signs are pinned (first \\|·\\| > eps component positive, descending
    λ). ``whiten=True`` scales each axis by 1/√λ (the
    :func:`pca_whiten` metric); ``whiten=False`` returns the pure
    ORTHONORMAL rotation — L2 distances are preserved, which is what
    :func:`aces_spark.datapipe.pq.opq_train` composes with PQ (OPQ's
    rotation must keep the metric or the ADC distances change meaning).
    ``return_values=True`` appends the eigenvalues (descending) to the
    tuple — OPQ's eigenvalue allocation needs them."""
    import numpy as np

    cov_rows = embedding_covariance(df, id_col, vec_col).collect()
    d = max(r["j"] for r in cov_rows)
    cov = np.zeros((d, d))
    mean_u = np.zeros(d)
    for r in cov_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov_q"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov_q"]
        if r["i"] == r["j"]:
            mean_u[r["i"] - 1] = r["sum_ui"] / r["n"]
    cov /= SCALE * SCALE  # micro² → original units
    mean = mean_u / SCALE

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        nz = np.flatnonzero(np.abs(vecs[:, c]) > eps)
        if nz.size and vecs[nz[0], c] < 0:
            vecs[:, c] = -vecs[:, c]
    w = vecs / np.sqrt(np.maximum(vals, eps)) if whiten else vecs
    out = (
        [float(x) for x in mean],
        [[float(w[i, c]) for c in range(w.shape[1])] for i in range(d)],
    )
    if return_values:
        return (*out, [float(v) for v in vals])
    return out


def projection_expr(
    vec_col: str, mean: list[float], w: list[list[float]]
) -> "F.Column":
    """``(x - mean) @ w`` as a literal-matrix Column expression over an
    array column — map-only JVM arithmetic, no UDF, no exchange; the
    serve-path shape shared by :func:`pca_whiten` and the OPQ rotation."""
    d = len(mean)
    comps = []
    for c in range(len(w[0])):
        terms = [
            f"(cast(element_at({vec_col}, {i + 1}) as double) - ({float(mean[i])!r}))"
            f" * ({float(w[i][c])!r})"
            for i in range(d)
        ]
        comps.append(f"cast({' + '.join(terms)} as float)")
    return F.expr("array(" + ", ".join(comps) + ")")


def pca_whiten(
    df: DataFrame,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-9,
) -> DataFrame:
    """Project embeddings onto the top ``n_components`` principal axes
    with 1/√λ whitening — output ``(id_col, whitened array<float>)``.

    The covariance is taken through :func:`embedding_covariance` (exact
    integers), eigendecomposed on the driver (d×d — the sanctioned
    bounded hop, same class as the k-means codebook collects), signs
    pinned (first component of each eigenvector with \\|·\\| > eps made
    positive), and the resulting (d × n_components) matrix is inlined as
    literal arithmetic: the projection itself is map-only JVM code, no
    UDF, no exchange.
    """
    mean, w = pca_fit(df, n_components, id_col, vec_col, eps, whiten=True)
    return df.select(
        F.col(id_col),
        projection_expr(vec_col, mean, w).alias("whitened"),
    )
