"""Product quantization (PQ) for embedding compression + compressed-domain
ANN — the standard memory-side companion to IVF (IVF-PQ is the layout
FAISS-style systems use at billion-vector scale).

Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its
PQ code with ``m=4`` subspaces is 4 bytes — a 64× reduction. The
distance scan then runs over CODES (reconstruction against a tiny
broadcast codebook), so the working set that has to move through the
cluster shrinks by the same factor. Encoding and scanning are pure
Column expressions (JVM, whole-stage codegen): the codebook — an
``m × n_codes × dim/m`` float tensor, a few KB — is inlined as a nested
array literal, exactly like the k-means centers in ``similarity.py``.

Determinism: the seed codebook (first ``n_codes`` vectors by id, sliced
per subspace) plus first-min argmin and sequential subspace-major
distance sums make every result exactly reproducible in the DuckDB
oracle; ranking follows the repo rule (rank on the 6-dp-ROUNDED distance
with an id tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import rank_topk

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_compression_stats",
    "save_ivfpq_index",
    "ivfpq_topk_indexed",
]


def _sqdist(a: Column, b: Column) -> Column:
    """Sequential (left-to-right, IEEE-deterministic) squared L2 distance."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _adc_table(qvec: Column, cb: Column, sub: int) -> Column:
    """Per-query ADC distance table: ``tab[j][c] = ||q_j - cb[j][c]||²``
    — computed ONCE per query row (O(m·n_codes·sub)), so the per-pair
    scan is pure lookups. The two-arg ``transform`` lambda provides the
    subspace index for the slice."""
    return F.transform(
        cb,
        lambda book, j: F.transform(
            book, lambda w: _sqdist(F.slice(qvec, j * sub + 1, sub), w)
        ),
    )


def _adc_dist(m: int) -> Column:
    """Sequential subspace-major sum of table lookups — the identical
    values in the identical order as the direct per-pair formulation,
    hence bit-equal results."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("__tab"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        ),
    )


def _codebook_lit(codebook: list[list[list[float]]]) -> Column:
    # ONE Literal node carrying the nested array, not a CreateArray tree
    # with m × n_codes × sub literal leaves: every column expression that
    # references the codebook embeds this subtree, so the unrolled form
    # multiplied ~1k nodes per reference into Catalyst analysis + codegen
    # (measured: pq_encode at sf0.1 dropped ~2.4 s → ~0.5 s). Same values.
    return F.lit(
        [[[float(x) for x in word] for word in book] for book in codebook]
    )


def pq_train(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    quantizer: str = "seed",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> list[list[list[float]]]:
    """Build the PQ codebook: an ``m × n_codes × (dim/m)`` nested list.
    Subspace ``j`` covers dims ``[j*dim/m, (j+1)*dim/m)``.

    ``quantizer="seed"``: codewords are the first ``n_codes`` vectors by
    id, sliced per subspace — iteration-free and exactly SQL-mirrorable
    (the differential-test choice, like ``similarity.seed_centroids``).
    ``quantizer="kmeans"``: an independent MLlib k-means per subspace
    (the production choice — subspace codebooks adapt to the data's
    marginal distributions). Either way the only driver-side
    materialization is the codebook itself (a few KB), same policy as
    ``similarity.kmeans_centroids``.
    """
    head = vectors.select(vec_col).first()
    if head is None:
        raise ValueError("pq_train: corpus is empty (no vectors to train on)")
    dim = len(head[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    if quantizer == "seed":
        rows = (
            vectors.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
            .orderBy("__id")
            .limit(n_codes)
            .collect()
        )
        if len(rows) < n_codes:
            raise ValueError(f"corpus has {len(rows)} vectors < n_codes={n_codes}")
        return [
            [[float(x) for x in r["__v"][j * sub : (j + 1) * sub]] for r in rows]
            for j in range(m)
        ]
    if quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        books = []
        for j in range(m):
            feats = vectors.select(
                array_to_vector(
                    F.slice(F.col(vec_col), j * sub + 1, sub).cast("array<double>")
                ).alias("__features")
            )
            model = KMeans(
                k=n_codes, seed=seed, maxIter=5, featuresCol="__features"
            ).fit(feats)
            books.append([[float(x) for x in c] for c in model.clusterCenters()])
        return books
    raise ValueError(f"unknown quantizer {quantizer!r} (expected 'seed' or 'kmeans')")


def pq_encode(
    vectors: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to its PQ code: per subspace, the index of the
    nearest codeword (first-min tie-break → smallest code). Output:
    ``(id_col, codes array<int>)``.

    Narrow, map-only plan: the codebook is a broadcast-free inline
    literal; no shuffle, no join — codes inherit the input partitioning,
    which is exactly what a 100 TB re-encode job needs.
    """
    vec = F.col(vec_col).cast("array<double>")
    return vectors.select(
        F.col(id_col), pq_encode_expr(vec, codebook).alias("codes")
    )


def pq_encode_expr(vec: Column, codebook: list[list[list[float]]]) -> Column:
    """The PQ code as a pure Column expression over ``vec`` — composable
    into any projection (e.g. the index build encodes AND cell-assigns in
    one map pass). Same argmin/tie semantics as :func:`pq_encode`."""
    m = len(codebook)
    sub = len(codebook[0][0])
    cb = _codebook_lit(codebook)

    def code_for(j: int) -> Column:
        dists = F.transform(
            cb[j], lambda w: _sqdist(F.slice(vec, j * sub + 1, sub), w)
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.array(*[code_for(j) for j in range(m)])


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compressed-domain top-k (asymmetric distance computation): for each
    query, the ``k`` corpus codes with the smallest reconstruction
    distance ``sum_j ||q_j - codeword[j][code_j]||²``. Output:
    ``(query_id, neighbor_id, pq_dist)``; rank on the 6-dp-rounded
    distance with neighbor-id tie-break (repo determinism rule).

    The scan side touches only ``(id, m-byte code)`` rows — the
    compressed corpus — and the queries broadcast. This is true ADC:
    each query precomputes its ``m × n_codes`` distance TABLE once (all
    query-to-codeword subspace distances), so per-(query, code) work is
    m table lookups + m additions — independent of both the original
    dimension AND the codebook size. The summed values are the identical
    subspace distances in the identical order, so results are bit-equal
    to the direct per-pair formulation (and to the SQL oracle).
    """
    m = len(codebook)
    sub = len(codebook[0][0])
    cb = _codebook_lit(codebook)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _adc_table(F.col(vec_col).cast("array<double>"), cb, sub).alias("__tab"),
    )
    c = codes.select(F.col(id_col).alias("neighbor_id"), F.col("codes"))
    dist = _adc_dist(m)
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(dist, 6).alias("pq_dist"))
    )
    return rank_topk(sims, k, "pq_dist", ascending=True)


def pq_compression_stats(
    codes: DataFrame, dim: int, m: int, bytes_per_dim: int = 4
) -> DataFrame:
    """One-row compression report: corpus size, raw vs coded bytes, and
    the compression ratio (codes are 1 byte per subspace for
    ``n_codes <= 256``). Pure aggregate — a sanity gate before swapping
    a pipeline onto the compressed path."""
    n = F.count(F.lit(1)).cast("long")
    raw = (n * dim * bytes_per_dim).cast("long")
    coded = (n * m).cast("long")
    return codes.agg(
        n.alias("n_vectors"),
        raw.alias("raw_bytes"),
        coded.alias("coded_bytes"),
        F.round(raw.cast("double") / coded.cast("double"), 2).alias("compression_x"),
    )


def save_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int | None = None,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "kmeans",
    target_bucket_size: int | None = None,
) -> None:
    """Build and persist an IVF-PQ index — the FAISS-style layout for
    billion-vector corpora: a coarse quantizer routes vectors to cells
    (directory-level partition pruning at query time, like
    ``similarity.save_ivf_index``) and each vector is stored as its m-byte
    PQ CODE instead of the raw floats, so the probed-cell scan reads the
    compressed corpus (64× smaller here).

    Writes ``{path}/centroids`` (tiny), ``{path}/codebook`` (m × n_codes
    rows), and ``{path}/cells`` partitioned by ``cell_id`` holding only
    ``(vec_id, codes)``.
    """
    from .similarity import (
        DEFAULT_TARGET_BUCKET_SIZE,
        _resolve_centroids,
        collect_centroid_rows,
        inline_cell_expr,
    )

    tbs = DEFAULT_TARGET_BUCKET_SIZE if target_bucket_size is None else target_bucket_size
    cents = _resolve_centroids(
        corpus, n_cells, None, id_col, vec_col, quantizer, tbs
    )
    codebook = pq_train(
        corpus, m=m, n_codes=n_codes,
        quantizer="seed" if quantizer == "seed" else "kmeans",
        id_col=id_col, vec_col=vec_col,
    )
    # encode AND assign row-locally in the same projection: the 100 TB
    # corpus is read once, map-only — no assignment crossJoin/agg and no
    # codes ⋈ cells join (both were shuffles of corpus-sized relations)
    cent_rows = collect_centroid_rows(cents)
    vec = F.col(vec_col).cast("array<double>")
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        pq_encode_expr(vec, codebook).alias("codes"),
        inline_cell_expr(vec, cent_rows).alias("cell_id"),
    )
    spark = corpus.sparkSession
    # JVM-side literal explode, not createDataFrame: the Python→JVM row
    # conversion path costs seconds of gateway/serializer overhead for
    # what is pure driver-known data (measured ~4 s of an ~11 s build)
    cb_df = (
        spark.range(1)
        .select(F.posexplode(_codebook_lit(codebook)).alias("subspace", "__book"))
        .select(
            F.col("subspace").cast("int").alias("subspace"),
            F.posexplode("__book").alias("code", "codeword"),
        )
        .select(
            "subspace", F.col("code").cast("int").alias("code"), "codeword"
        )
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    cb_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    # cluster by cell before the partitioned write (see save_ivf_index):
    # ~1 file per cell instead of |tasks| × |cells| small files
    assigned.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{path}/cells")


def ivfpq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Query a :func:`save_ivfpq_index` index: route each query to its
    ``n_probes`` nearest cells, statically prune the scan to those cell
    directories (the probe-id ``IN`` filter is the same sanctioned driver
    hop as ``ivf_topk_indexed``), and rank candidates by the PQ
    asymmetric reconstruction distance over CODES — the scan never touches
    a raw corpus vector. Output ``(query_id, neighbor_id, pq_dist)``
    (6-dp rounded, id tie-break)."""
    from .similarity import assign_cells

    cents = spark.read.parquet(f"{path}/centroids")
    cb_rows = spark.read.parquet(f"{path}/codebook").collect()
    mx = max(r["subspace"] for r in cb_rows) + 1
    kx = max(r["code"] for r in cb_rows) + 1
    codebook = [[None] * kx for _ in range(mx)]
    for r in cb_rows:
        codebook[r["subspace"]][r["code"]] = list(r["codeword"])

    query_cells = assign_cells(
        queries, cents, id_col, vec_col, n_probes=n_probes
    ).withColumnRenamed("vec_id", "query_id")
    probe_ids = [r["cell_id"] for r in query_cells.select("cell_id").distinct().collect()]
    cells = spark.read.parquet(f"{path}/cells").filter(F.col("cell_id").isin(probe_ids))

    sub = len(codebook[0][0])
    cb = _codebook_lit(codebook)
    # per-query ADC table (see pq_topk): pure lookups on the probed scan
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _adc_table(F.col(vec_col).cast("array<double>"), cb, sub).alias("__tab"),
    ).join(query_cells, "query_id")
    c = cells.select(F.col("vec_id").alias("neighbor_id"), "codes", "cell_id")
    dist = _adc_dist(mx)
    sims = (
        F.broadcast(q)
        .join(c, on="cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(dist, 6).alias("pq_dist"))
    )
    return rank_topk(sims, k, "pq_dist", ascending=True)
