"""Similarity search over embedding columns (``array<float>``).

* **brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, compute cosine with JVM-side higher-order
  functions (``zip_with`` + ``aggregate``: no Python in the loop), take
  top-k per query with a rank window. One shuffle (by query) of size
  |queries| × |corpus| rows *after* predicate pushdown — at 100 TB the
  corpus side stays partition-local because the query side is broadcast.
* **LSH-bucketed (IVF-style) ANN** — the scale path: assign every vector to
  its nearest of K deterministic seed centroids (coarse quantizer), search
  only within the query's probe cells. Turns the crossJoin into a
  bucket-equi-join keyed by cell id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.litfast import array_lit


#: Target vectors-per-cell for the auto-sized IVF quantizer. With cells
#: sized to a constant, candidate-pair work per cell is O(target²) and the
#: number of cells grows linearly with the corpus — the whole near-dup /
#: ANN pass stays linear at 100 TB instead of O(n²/k) with a fixed k.
DEFAULT_TARGET_BUCKET_SIZE = 1024


def auto_n_cells(n_vectors: int, target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE) -> int:
    """Corpus-proportional cell count: ``max(8, n // target_bucket_size)``."""
    return max(8, n_vectors // max(1, target_bucket_size))


def _resolve_centroids(
    vectors: DataFrame,
    n_cells: int | None,
    centroids: DataFrame | None,
    id_col: str,
    vec_col: str,
    quantizer: str,
    target_bucket_size: int,
) -> DataFrame:
    """Default-centroid policy shared by :func:`ivf_topk` and
    :func:`cosine_dup_pairs`.

    * explicit ``centroids`` frame → used as-is;
    * otherwise ``n_cells`` defaults to corpus-proportional sizing
      (:func:`auto_n_cells`; the ``count()`` is one cheap metadata-heavy
      job, paid once at plan-build);
    * ``quantizer="kmeans"`` (default) → MLlib-trained centers, which
      split dense regions so no cell degenerates into an O(n²) bucket on
      skewed corpora; ``quantizer="seed"`` → the deterministic
      first-k-by-id quantizer (iteration-free, exactly reproducible in a
      SQL oracle — the right choice for differential testing, NOT for
      skewed production corpora).
    """
    if centroids is not None:
        return centroids
    if n_cells is None:
        n_cells = auto_n_cells(vectors.count(), target_bucket_size)
    if quantizer == "kmeans":
        return kmeans_centroids(vectors, k=n_cells, id_col=id_col, vec_col=vec_col)
    if quantizer == "seed":
        return seed_centroids(vectors, n_cells, id_col, vec_col)
    raise ValueError(f"unknown quantizer {quantizer!r} (expected 'kmeans' or 'seed')")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def rank_topk(
    sims: DataFrame,
    k: int,
    score_col: str,
    ascending: bool = False,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """THE top-k epilogue every ANN path shares: rank on the (already
    rounded) score with the id tie-break and keep k per query. One
    definition so the determinism rule cannot silently diverge between
    the brute-force, IVF, indexed, LSH, and PQ paths."""
    score = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.partitionBy(query_col).orderBy(score, F.col(id_col).asc())
    return (
        sims.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float-array columns (JVM-side).

    NULL when either vector has zero norm: the 0/0 division is a hard
    error under ANSI mode and a NaN under non-ANSI — and Spark orders
    NaN ABOVE every double, so an unguarded ``NaN >= threshold`` would
    silently flag every zero-vector pair a near-duplicate. NULL instead
    drops out of threshold filters and sorts last in desc rankings on
    both engines."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k most similar corpus
    vectors (excluding itself). Returns
    ``(query_id, neighbor_id, cosine_sim)`` with deterministic tie-breaking
    (similarity desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))

    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
        )
    )
    return rank_topk(sims, k, "cosine_sim")


def mutual_pairs_from_topk(topk: DataFrame) -> DataFrame:
    """Mutual-kNN pair extraction (r10): given ANY top-k neighbor
    relation ``(query_id, neighbor_id, cosine_sim)`` — brute-force,
    IVF-pruned, or PQ-approximated — keep only the RECIPROCAL pairs
    (a ∈ knn(b) AND b ∈ knn(a), emitted once with ``vec_a < vec_b``).
    Mutuality is the classic precision filter for embedding near-dup
    mining: a hub vector appears in thousands of neighbor lists without
    reciprocating, so one-directional top-k floods the dedup candidate
    set with hub noise; requiring both directions kills exactly those
    (Jégou et al.'s reciprocal-NN rule, the SemDeDup-family cleanup).

    Pure relational, linear in the top-k relation: one self-equi-join
    on the ordered pair key — the expensive part is whatever produced
    ``topk``, so at 100 TB feed this from the IVF/PQ path, not brute
    force. Output ``(vec_a, vec_b, cosine_sim)`` with the similarity
    taken from the a→b direction (both directions score identically
    under the engine's 6-dp-rounded symmetric cosine)."""
    fwd = topk.filter(F.col("query_id") < F.col("neighbor_id")).select(
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        "cosine_sim",
    )
    rev = topk.filter(F.col("query_id") > F.col("neighbor_id")).select(
        F.col("neighbor_id").alias("vec_a"),
        F.col("query_id").alias("vec_b"),
    )
    return fwd.join(rev, ["vec_a", "vec_b"])


def mutual_topk_pairs(
    vectors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact mutual-kNN pairs: :func:`brute_force_topk` with the corpus
    as its own query set, then :func:`mutual_pairs_from_topk`. The
    brute pass broadcasts the query side — corpus-sized here — so this
    convenience form is for corpora that fit the broadcast budget
    (validation, reranking candidate pools); the scale path composes
    ``mutual_pairs_from_topk`` over the IVF/PQ top-k instead."""
    return mutual_pairs_from_topk(
        brute_force_topk(vectors, vectors, k=k, id_col=id_col, vec_col=vec_col)
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its ``n_probes``
    nearest centroids (by cosine). ``centroids`` is ``(cell_id, centroid)``
    and must be small (broadcast). Deterministic ties: lowest cell_id wins.
    ``n_probes=1`` (storage-side assignment) emits one row per vector;
    higher values are the query-side multi-probe expansion.

    Plan shape: broadcast-crossJoin to score |v|×k candidate rows, then an
    AGGREGATION picks the argmax — ``max_by`` for one probe, an
    ``array_sort``'d ``collect_list`` slice for multi-probe. Aggregations
    partial-combine map-side (k rows per vector collapse before the
    exchange) and need no sort, unlike the row_number window this
    replaces, which shuffled and sorted the full scored relation
    (measured ~2× on the bench corpus)."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec"))
    c = centroids.select("cell_id", F.col("centroid").alias("__cent"))
    scored = F.broadcast(c).crossJoin(v).select(
        "vec_id",
        "cell_id",
        F.round(cosine(F.col("__vec"), F.col("__cent")), 9).alias("__sim"),
    )
    # rank key: maximize (sim, -cell_id) lexicographically ⇒ ties go to
    # the lowest cell_id — identical to the former (sim desc, cell asc)
    rank = F.struct(F.col("__sim").alias("s"), (-F.col("cell_id")).alias("nc"))
    if n_probes == 1:
        return scored.groupBy("vec_id").agg(F.max_by("cell_id", rank).alias("cell_id"))
    ranked = scored.groupBy("vec_id").agg(
        F.slice(
            F.reverse(F.array_sort(F.collect_list(F.struct(rank.alias("r"), F.col("cell_id"))))),
            1,
            n_probes,
        ).alias("__top")
    )
    return ranked.select("vec_id", F.explode(F.col("__top.cell_id")).alias("cell_id"))


def inline_cell_expr(
    vec: Column, centroid_rows: list[tuple[int, list[float]]]
) -> Column:
    """Row-local IVF cell assignment: the centroid matrix rides along as
    ONE nested-array literal and the argmax runs inside the projection —
    no crossJoin, no aggregate, no shuffle. Exactly the values
    :func:`assign_cells` (n_probes=1) produces: cosine rounded to 9 dp,
    ties to the lowest cell_id (``array_position`` returns the FIRST
    maximum; rows are scored in cell_id-ascending order).

    This is the storage-side assignment for index BUILDS (encode + assign
    in one map pass over the corpus — the only shape that doesn't shuffle
    100 TB twice); the DataFrame-based :func:`assign_cells` remains the
    query-side multi-probe path.
    """
    rows = sorted(centroid_rows)
    # array_lit: one JVM parse instead of one py4j round-trip per element
    # (k×dim elements — seconds of driver time per call site via F.lit)
    cl = array_lit([[float(x) for x in c] for _, c in rows])
    ids = array_lit([int(i) for i, _ in rows])
    scores = F.transform(cl, lambda c: F.round(cosine(vec, c), 9))
    pos = F.array_position(scores, F.array_max(scores))
    return F.element_at(ids, pos.cast("int")).alias("cell_id")


def assign_cells_batched(
    vectors: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Large-k cell assignment as ONE Arrow-batched numpy matmul per
    batch: normalize the k×dim centroid matrix once in the closure,
    normalize each batch of vectors, ``argmax(Xn @ Cn.T)`` — BLAS does
    k·dim multiply-adds per row instead of k interpreted higher-order
    lambda folds (:func:`assign_cells`'s crossJoin scoring measured
    ~6 min for 220k×256×32; this shape is seconds). Same semantics:
    cosine rounded to 9 dp, first-max tie-break ⇒ lowest cell_id
    (``np.argmax`` returns the first maximum over the cell_id-ascending
    matrix); zero-norm vectors score 0 everywhere and land in the first
    cell instead of dividing by zero.

    Map-only (no crossJoin, no shuffle — output partitioning follows
    input), so it is also the right STORAGE-side assignment at 100 TB
    when k is past the literal budget of :func:`inline_cell_expr`. The
    one caveat vs :func:`assign_cells` is float summation order: BLAS
    pairwise sums can differ from the sequential lambda fold in the last
    ulp, so a sim sitting EXACTLY on a rounding boundary may tip — use
    :func:`assign_cells` where bit-exact oracle parity is the contract.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows_sorted = sorted(centroid_rows)
    ids = np.array([int(i) for i, _ in rows_sorted], dtype=np.int32)
    cmat = np.asarray([c for _, c in rows_sorted], dtype=np.float64)
    cn = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)

    src = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )
    out_schema = T.StructType(
        [src.schema["vec_id"], T.StructField("cell_id", T.IntegerType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell_id": []})
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            sims = np.round(xn @ cn.T, 9)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell_id": ids[np.argmax(sims, axis=1)]}
            )

    return src.mapInPandas(run, out_schema)


def collect_centroid_rows(centroids: DataFrame) -> list[tuple[int, list[float]]]:
    """Driver-side (tiny, sanctioned) materialization of a centroid frame
    for :func:`inline_cell_expr`."""
    return [
        (int(r["cell_id"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    ]


def centroid_rows_df(spark, centroid_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Rebuild a ``(cell_id, centroid)`` frame from already-collected
    centroid rows as a JVM-side literal explode (the ``save_ivfpq_index``
    codebook trick — no Python→JVM row conversion, no replay of the
    quantizer subtree). Used wherever a centroid frame is needed AFTER
    :func:`collect_centroid_rows` already paid the driver hop: the seed
    quantizer's distributed top-k would otherwise re-scan the corpus once
    per consumer (the centroid parquet write, the query-side broadcast)."""
    rows = sorted(centroid_rows)
    ids = array_lit([int(i) for i, _ in rows])
    cl = array_lit([[float(x) for x in c] for _, c in rows])
    return (
        spark.range(1)
        .select(F.posexplode(cl).alias("__p", "centroid"))
        .select(
            F.element_at(ids, (F.col("__p") + 1).cast("int"))
            .cast("int")
            .alias("cell_id"),
            "centroid",
        )
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Trained coarse centroids for the IVF quantizer: MLlib k-means over
    the corpus (distributed Lloyd iterations; the model's k centers — a
    k×dim matrix — are the only driver-side materialization). Same output
    shape as :func:`seed_centroids`, so it drops into :func:`ivf_topk` /
    :func:`cosine_dup_pairs` via their ``centroids`` hooks or standalone
    :func:`assign_cells`. Deterministic for a fixed ``seed``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__features").fit(feats)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, centroid array<double>",
    )


def seed_centroids(vectors: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse centroids: the first ``k`` vectors by id (a
    fixed, iteration-free quantizer — :func:`kmeans_centroids` is the
    trained alternative when quality matters; the plumbing is identical)."""
    # orderBy().limit(k) first: Spark plans it as a distributed top-k
    # (TakeOrderedAndProject), so the global row_number window — which
    # funnels its input through ONE partition — only ever sees k rows,
    # not the corpus.
    w = Window.orderBy(F.col("__sid").asc())
    return (
        vectors.select(F.col(id_col).alias("__sid"), F.col(vec_col).alias("centroid"))
        .orderBy(F.col("__sid").asc())
        .limit(k)
        .withColumn("cell_id", F.row_number().over(w) - 1)
        .select("cell_id", "centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    centroids: DataFrame | None = None,
    quantizer: str = "kmeans",
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
) -> DataFrame:
    """Approximate top-k: quantize corpus + queries into ``n_cells`` cells,
    then brute-force only within the query's ``n_probes`` nearest cells.
    Each corpus vector lives in exactly one cell, so multi-probe needs no
    candidate dedup; ``n_probes = n_cells`` recovers exact brute force.

    Defaults are scale-safe: ``n_cells`` sizes itself to the corpus
    (:func:`auto_n_cells`, ~``target_bucket_size`` vectors per cell) and
    the quantizer is MLlib-trained k-means; pass ``quantizer="seed"`` for
    the deterministic iteration-free variant or ``centroids`` for a
    pre-trained frame. Same output shape as :func:`brute_force_topk`."""
    cents = _resolve_centroids(
        corpus, n_cells, centroids, id_col, vec_col, quantizer, target_bucket_size
    )
    # collect the centroid matrix ONCE, then every consumer (query-side
    # assignment, corpus-side inline argmax) reads the literal — with the
    # seed quantizer the `cents` plan is a distributed top-k over the
    # corpus, and re-evaluating it inside the query job's broadcast
    # subtree would re-scan the corpus per consumer (r10)
    cent_rows = collect_centroid_rows(cents)
    cents_lit = centroid_rows_df(corpus.sparkSession, cent_rows)
    query_cells = assign_cells(queries, cents_lit, id_col, vec_col, n_probes=n_probes).withColumnRenamed(
        "vec_id", "query_id"
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")).join(
        query_cells, "query_id"
    )
    # corpus-side assignment is ROW-LOCAL when the centroid matrix fits
    # the literal budget (r10; the save_ivfpq_index lesson applied to the
    # in-memory path): the centroids ride along as one nested-array
    # literal and the argmax runs inside the projection — identical
    # values to assign_cells(n_probes=1) (9-dp cosine, lowest-cell tie),
    # but the corpus-sized corpus ⋈ corpus_cells id-join (a full shuffle
    # of the vectors at 100 TB) disappears. Large-k quantizers past the
    # literal budget keep the relational assignment.
    n_slots = sum(len(c) for _, c in cent_rows) + len(cent_rows)
    from .kmeans import MAX_LITERAL_SLOTS

    if n_slots <= MAX_LITERAL_SLOTS:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        ).withColumn("cell_id", inline_cell_expr(F.col("__cvec"), cent_rows))
    else:
        corpus_cells = assign_cells(corpus, cents_lit, id_col, vec_col).withColumnRenamed(
            "vec_id", "neighbor_id"
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        ).join(corpus_cells, "neighbor_id")

    sims = (
        F.broadcast(q)
        .join(c, on="cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
        )
    )
    return rank_topk(sims, k, "cosine_sim")


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    quantizer: str = "kmeans",
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
) -> None:
    """Build and persist an IVF index: the "index once, query many"
    production shape. Writes ``{path}/centroids`` (tiny) and
    ``{path}/cells`` — the corpus vectors PARTITIONED BY ``cell_id`` on
    disk, so a query batch's scan statically prunes to its probed cells'
    directories and never touches the rest of the corpus (the on-disk
    analog of the in-memory cell bucketing).

    The one-time build cost is the quantizer training + one cell-keyed
    shuffle; afterwards :func:`ivf_topk_indexed` runs with NO corpus-side
    assignment work at all.
    """
    cents = _resolve_centroids(
        corpus, n_cells, centroids, id_col, vec_col, quantizer, target_bucket_size
    )
    # collect once (k rows); assignment becomes a row-local argmax, so the
    # corpus is read ONCE in one map pass — no crossJoin/agg/join jobs
    cent_rows = collect_centroid_rows(cents)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    ).withColumn(
        "cell_id", inline_cell_expr(F.col("embedding"), cent_rows)
    )
    # write the centroids from the ALREADY-collected rows (JVM literal
    # explode): `cents.write` would re-evaluate the quantizer plan — for
    # the seed quantizer a second distributed top-k scan of the corpus
    centroid_rows_df(corpus.sparkSession, cent_rows).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    # cluster by cell BEFORE the partitioned write: otherwise every write
    # task holds rows of every cell and emits |tasks| × |cells| small
    # files (the small-file storm `sinks.compact_parquet` exists to fix);
    # hash-repartitioned, each cell's rows sit in one task → ~1 file/cell
    assigned.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{path}/cells")


def append_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Absorb a new batch into a persisted IVF index WITHOUT a rebuild —
    the operation a continuously-ingesting 100 TB corpus actually needs
    (FAISS's add-to-trained-index). The frozen coarse quantizer is read
    back from ``{path}/centroids`` (tiny), the batch is assigned
    row-locally with the same inline argmax as the build, and the
    cell-partitioned parquet is APPENDED: only the touched cell
    directories gain files, nothing existing rewrites, and
    :func:`ivf_topk_indexed` immediately sees the union corpus with the
    same static partition pruning.

    Centroids stay frozen — standard IVF practice (the quantizer is
    trained once; distribution drift is handled by periodic retrain +
    rebuild, a policy decision this function deliberately does not
    hide). Appends are therefore associative and idempotent-per-batch:
    index(base) + append(b1) + append(b2) ≡ index built over the union
    with the SAME centroids, which is exactly what the oracle checks.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    cent_rows = collect_centroid_rows(cents)
    assigned = new_vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    ).withColumn("cell_id", inline_cell_expr(F.col("embedding"), cent_rows))
    # same small-file discipline as the build: cluster by cell first
    assigned.repartition("cell_id").write.mode("append").partitionBy(
        "cell_id"
    ).parquet(f"{path}/cells")


def delete_from_ivf_index(
    spark,
    path: str,
    delete_ids: DataFrame,
    id_col: str = "vec_id",
) -> int:
    """Mark vectors deleted in a persisted IVF index WITHOUT touching the
    cell data — the tombstone half of LSM-style maintenance (FAISS's
    ``remove_ids`` analog for a parquet-backed index). Appends
    ``(vec_id, cell_id)`` rows to ``{path}/tombstones``;
    :func:`ivf_topk_indexed` anti-joins them (broadcast — tombstones are
    the small delta by construction) and :func:`compact_ivf_index`
    physically reclaims them later.

    The ids' cells are looked up with ONE column-pruned scan of the
    index (vec_id + the directory-derived cell_id only — <2% of the
    corpus bytes at realistic dims), pinned at delete time so compaction
    can rewrite ONLY the dirty cell directories without re-scanning.
    Ids absent from the index are ignored (idempotent re-delete).
    Returns the number of tombstones written.

    Contract note: tombstones are id-keyed. Re-appending a tombstoned id
    via :func:`append_ivf_index` stays invisible until
    :func:`compact_ivf_index` clears the tombstone — run compaction
    before id reuse (the same discipline every LSM store documents).
    """
    ids = delete_ids.select(F.col(id_col).alias("vec_id")).distinct()
    cells = spark.read.parquet(f"{path}/cells").select("vec_id", "cell_id")
    tomb = cells.join(F.broadcast(ids), "vec_id")
    # tiny by construction (|delete batch| rows); one file keeps the
    # query-side broadcast read cheap
    tomb.coalesce(1).write.mode("append").parquet(f"{path}/tombstones")
    return tomb.count()


def _read_ivf_tombstones(spark, path: str):
    """The index's tombstone relation, or None if nothing was deleted."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(f"{path}/tombstones")
    except AnalysisException:
        return None


def compact_ivf_index(spark, path: str) -> dict:
    """Physically reclaim tombstoned vectors: rewrite ONLY the dirty cell
    directories (dynamic partition overwrite — clean cells' files are
    never opened, never rewritten), drop cells left empty, then clear
    the tombstone relation. Returns
    ``{"n_cells_rewritten", "n_cells_dropped", "n_rows_removed"}``.

    Scale shape: the tombstones carry their cell ids from delete time,
    so the dirty-cell set is a tiny distinct over the tombstone relation
    — compaction reads and rewrites exactly the dirty cells' rows (a
    static ``IN`` partition filter, like the query path's probe
    pruning), one cell-keyed repartition before the partitioned write
    (the build's small-file discipline). Cost is proportional to the
    DELETED FRACTION of the corpus, not the corpus."""
    from pyspark.errors import AnalysisException

    tomb = _read_ivf_tombstones(spark, path)
    if tomb is None:
        return {"n_cells_rewritten": 0, "n_cells_dropped": 0, "n_rows_removed": 0}
    tomb = tomb.localCheckpoint(eager=True)
    dirty = [r["cell_id"] for r in tomb.select("cell_id").distinct().collect()]
    if not dirty:
        _delete_path(spark, f"{path}/tombstones")
        return {"n_cells_rewritten": 0, "n_cells_dropped": 0, "n_rows_removed": 0}

    cells = spark.read.parquet(f"{path}/cells").filter(F.col("cell_id").isin(dirty))
    surviving = cells.join(
        F.broadcast(tomb.select("vec_id")), "vec_id", "left_anti"
    ).localCheckpoint(eager=True)  # materialize BEFORE overwriting the source dirs
    n_before = cells.count()
    n_after = surviving.count()
    kept_cells = {r["cell_id"] for r in surviving.select("cell_id").distinct().collect()}

    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        if n_after:
            surviving.repartition("cell_id").write.mode("overwrite").partitionBy(
                "cell_id"
            ).parquet(f"{path}/cells")
    finally:
        spark.conf.set(conf_key, prev)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # frame; cells whose every vector died need their dirs dropped by hand
    dropped = [c for c in dirty if c not in kept_cells]
    for c in dropped:
        _delete_path(spark, f"{path}/cells/cell_id={c}")
    _delete_path(spark, f"{path}/tombstones")
    return {
        "n_cells_rewritten": len(kept_cells),
        "n_cells_dropped": len(dropped),
        "n_rows_removed": n_before - n_after,
    }


def _delete_path(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (works on any
    scheme the session can write — local, HDFS, object stores)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(jsc.hadoopConfiguration())
    fs.delete(p, True)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k against a :func:`save_ivf_index` index. The probe
    cell ids (``|queries| × n_probes`` distinct values — tiny by
    construction) are collected driver-side and pushed into the scan as an
    ``IN`` partition filter, so only the probed cell directories are read.
    Same output shape and semantics as :func:`ivf_topk`. Vectors
    tombstoned by :func:`delete_from_ivf_index` are excluded with a
    broadcast anti-join restricted to the probed cells; a clean index
    (no tombstone relation) keeps the exact pre-delete plan."""
    cents = spark.read.parquet(f"{path}/centroids")
    query_cells = assign_cells(queries, cents, id_col, vec_col, n_probes=n_probes).withColumnRenamed(
        "vec_id", "query_id"
    )
    # tiny, sanctioned driver hop (like auto cell sizing): the distinct
    # probe set bounds at n_queries × n_probes values
    probe_ids = [r["cell_id"] for r in query_cells.select("cell_id").distinct().collect()]
    cells = spark.read.parquet(f"{path}/cells").filter(F.col("cell_id").isin(probe_ids))
    tomb = _read_ivf_tombstones(spark, path)
    if tomb is not None:
        cells = cells.join(
            F.broadcast(
                tomb.filter(F.col("cell_id").isin(probe_ids)).select("vec_id")
            ),
            "vec_id",
            "left_anti",
        )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")).join(
        query_cells, "query_id"
    )
    c = cells.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cvec"), "cell_id"
    )
    sims = (
        F.broadcast(q)
        .join(c, on="cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
        )
    )
    return rank_topk(sims, k, "cosine_sim")


def ivf_recall_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    centroids: DataFrame | None = None,
    quantizer: str = "kmeans",
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
) -> DataFrame:
    """Measured recall@k of the IVF path against exact brute force, per
    query: ``(query_id, n_hits, recall)`` where ``n_hits`` counts IVF
    results that appear in the exact top-k and ``recall = n_hits / |exact top-k|`` in
    exact basis points. The operational dial for the accuracy↔cost
    trade: sweep ``n_probes`` until recall clears the target, THEN scale
    out — measuring on a sample costs |queries|×|corpus| only for the
    exact side, which is the point of keeping the query set small.

    Both sides share deterministic tie-breaking (sim desc, id asc), so
    recall is reproducible run-to-run and engine-to-engine.
    """
    exact = brute_force_topk(corpus, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(
        corpus, queries, k, n_cells, id_col, vec_col, n_probes, centroids,
        quantizer, target_bucket_size,
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__hits")
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("__n"))
    n_hits = F.coalesce(F.col("__hits"), F.lit(0))
    recall_bp = F.floor(n_hits / F.col("__n") * 10000 + 0.5)
    return base.join(hits, "query_id", "left").select(
        "query_id",
        n_hits.cast("long").alias("n_hits"),
        (recall_bp / 10000).alias("recall"),
    )


def ivf_cell_stats(
    vectors: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    quantizer: str = "kmeans",
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
) -> DataFrame:
    """Index-balance report: per-cell vector count and corpus fraction
    (basis points). The skew check run BEFORE committing to an IVF layout
    — a cell holding a large fraction of the corpus means the quantizer
    collapsed a dense region and that cell's bucket join will go
    quadratic; the fix is more cells or the trained quantizer. Cost: one
    assign pass + a groupBy on ≤ n_cells keys; the fraction comes from an
    unpartitioned window over the (tiny, n_cells-row) aggregate, never
    over the corpus."""
    cents = _resolve_centroids(
        vectors, n_cells, centroids, id_col, vec_col, quantizer, target_bucket_size
    )
    # row-local assignment inside the literal budget (r10): the report is
    # then ONE map pass + an n_cells-key aggregate — no crossJoin stage
    cent_rows = collect_centroid_rows(cents)
    n_slots = sum(len(c) for _, c in cent_rows) + len(cent_rows)
    from .kmeans import MAX_LITERAL_SLOTS

    if n_slots <= MAX_LITERAL_SLOTS:
        assigned = vectors.select(
            inline_cell_expr(F.col(vec_col), cent_rows).alias("cell_id")
        )
    else:
        # literal centroid frame: the quantizer plan never re-evaluates
        # inside the assignment job (see ivf_topk)
        assigned = assign_cells(
            vectors,
            centroid_rows_df(vectors.sparkSession, cent_rows),
            id_col,
            vec_col,
        )
    counts = assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = F.sum("n_vectors").over(Window.partitionBy())
    frac_bp = F.floor(F.col("n_vectors") / total * 10000 + 0.5)
    return counts.select(
        "cell_id",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        (frac_bp / 10000).alias("frac"),
    )


def embedding_dim_stats(
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension embedding QA report: ``(dim, n, mean, stddev)``
    (6 dp) — the drift/degeneracy check run before trusting an embedding
    column (a collapsed dimension shows stddev ≈ 0; a shifted batch shows
    mean drift). ``posexplode`` is narrow; the aggregate keys on the
    dimension index (uniform, cardinality = dim count) with map-side
    partials; stddev is the explicit population formula
    ``sqrt(E[x²] − E[x]²)`` so both engines evaluate the same expression
    tree."""
    d = vectors.select(F.posexplode(F.col(vec_col)).alias("__pos", "__x")).select(
        F.col("__pos").cast("long").alias("dim"), "__x"
    )
    agg = d.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__x").alias("__mean"),
        F.avg(F.col("__x") * F.col("__x")).alias("__meansq"),
    )
    var = F.greatest(F.col("__meansq") - F.col("__mean") * F.col("__mean"), F.lit(0.0))
    return agg.select(
        "dim",
        "n",
        F.round(F.col("__mean"), 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("stddev"),
    )


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean embedding (class centroids): the base artifact for
    centroid classifiers, per-class drift monitoring, and seeding
    quantizers from labels. Output: ``(label, n_vectors, centroid)``
    with the centroid at 6 dp.

    Engine-exact at any scale: components are summed in DECIMAL(28,12)
    (order-independent EXACT addition — float partial-sum order across
    partitions is the usual oracle-breaker for distributed means), then
    one double division per dimension and the floor(x·10⁶+0.5) rounding
    rule. Plan: narrow ``posexplode`` → (label, dim)-keyed aggregate
    (uniform keys, map-side partials) → per-label sorted reassembly.
    """
    d = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__dim", "__x"),
    )
    per_dim = d.groupBy("label", "__dim").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast("decimal(28,12)")).alias("__sum"),
    )
    mean = F.col("__sum").cast("double") / F.col("__n").cast("double")
    rounded = F.floor(mean * 1000000 + 0.5).cast("double") / 1000000.0
    return (
        per_dim.select("label", "__dim", "__n", rounded.alias("__m"))
        .groupBy("label")
        .agg(
            F.max("__n").alias("n_vectors"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("__dim", "__m"))),
                lambda s: s["__m"],
            ).alias("centroid"),
        )
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    quantizer: str = "kmeans",
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates are restricted to
    vectors sharing an IVF cell (the linear-scale stage), then exact cosine
    filters at ``threshold``. Returns ``(vec_a, vec_b, cosine_sim)`` with
    ``vec_a < vec_b``, similarity rounded to 6 dp.

    At corpus scale this is a bucket equi-join on cell id — never an
    all-pairs crossJoin. Defaults are scale-safe: ``n_cells`` tracks the
    corpus size (~``target_bucket_size`` vectors per cell, so per-cell
    pair work stays O(target²) and total work linear) and the trained
    k-means quantizer splits dense regions instead of letting one hot cell
    go quadratic; ``quantizer="seed"`` is the deterministic oracle-able
    variant. Recall is tuned with ``n_cells`` (fewer cells = higher
    recall, bigger buckets).
    """
    head = vectors.select(vec_col).first()
    if head is None:
        spark = vectors.sparkSession
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, cosine_sim double"
        )
    dim = len(head[0])
    cents = _resolve_centroids(
        vectors, n_cells, centroids, id_col, vec_col, quantizer, target_bucket_size
    )
    # precompute each vector's norm ONCE — inside the pair join it would be
    # recomputed |pairs| times (3× the arithmetic for 64-dim vectors) —
    # and flatten coordinates to DOUBLE scalar columns BEFORE the pair
    # join: per-pair element_at does not codegen into tight arithmetic
    # (measured 5× slower at 1M pairs — the semantic_dedup lesson), and
    # float32 inputs widened to double make every product EXACT, matching
    # the all-double oracle arithmetic bit for bit. Expression strings,
    # not Column composition (py4j round-trip per node).
    # zero-norm vectors are excluded up front: their cosine is 0/0 → NaN,
    # and Spark orders NaN above every double, so NaN >= threshold would
    # silently flag every zero-vector pair a near-duplicate
    v = (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec"))
        .withColumn("__norm", _norm(F.col("__vec")))
        .filter(F.col("__norm") > 0)
    )
    # cell assignment is ROW-LOCAL when the centroid matrix fits the
    # literal budget (r10, the ivf_topk/save_ivfpq_index shape): kills
    # the corpus-sized vectors ⋈ cells id-join — which, feeding BOTH
    # self-join sides below, also replayed the assignment crossJoin+agg
    # once per branch. Identical values to assign_cells (9-dp cosine,
    # lowest-cell tie-break). Large-k quantizers keep the relational path.
    cent_rows = collect_centroid_rows(cents)
    n_slots = sum(len(c) for _, c in cent_rows) + len(cent_rows)
    from .kmeans import MAX_LITERAL_SLOTS

    if n_slots <= MAX_LITERAL_SLOTS:
        v = v.withColumn("cell_id", inline_cell_expr(F.col("__vec"), cent_rows))
    else:
        cells = assign_cells(vectors, cents, id_col, vec_col)
        v = v.join(cells, "vec_id")
    a = v.selectExpr(
        "cell_id",
        "vec_id AS vec_a",
        "__norm AS __na",
        *[
            f"CAST(element_at(__vec, {d + 1}) AS DOUBLE) AS __a{d}"
            for d in range(dim)
        ],
    )
    b = v.selectExpr(
        "cell_id",
        "vec_id AS vec_b",
        "__norm AS __nb",
        *[
            f"CAST(element_at(__vec, {d + 1}) AS DOUBLE) AS __b{d}"
            for d in range(dim)
        ],
    )
    dot_sql = " + ".join(f"__a{d} * __b{d}" for d in range(dim))
    return (
        a.join(b, on="cell_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .selectExpr(
            "vec_a",
            "vec_b",
            f"round(({dot_sql}) / (__na * __nb), 6) AS cosine_sim",
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _rademacher_matrix(dim: int, out_dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic ±1 (Rademacher) projection rows derived from md5 of
    (seed, out_row, in_dim) — the same portable-hash recipe as
    :func:`_hyperplanes`. Driver-side cost is ``out_dim × dim`` floats."""
    import hashlib

    rows = []
    for j in range(out_dim):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"rp|{seed}|{j}|{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        rows.append(row)
    return rows


def random_projection(
    vectors: DataFrame,
    out_dim: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a deterministic
    Rademacher (±1) matrix: reduce each embedding to ``out_dim``
    components — the cheap dimensionality cut before LSH/IVF indexing at
    corpus scale (pairwise distances are preserved within 1±ε for
    ``out_dim = O(log n / ε²)``, and a ±1 matrix needs no float
    multiplies, only adds/subtracts). Output LONG format
    ``(id, dim_idx, proj)`` with ``proj`` rounded to 6 dp — scalar rows,
    the shape the harness can canonicalize (the label_centroids lesson).

    Scale shape: map-only — the matrix is an inline literal (a few KB,
    baked into the plan like the PQ codebook), each row's projection is
    ``out_dim`` JVM fold expressions, no shuffle at all; the posexplode
    multiplies rows by ``out_dim``, not bytes by ``dim``. ``in_dim`` is
    read from one sample row when not given (a bounded driver hop).
    """
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    if in_dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("random_projection: empty input and no in_dim given")
        in_dim = int(first["d"])
    mat = _rademacher_matrix(in_dim, out_dim, seed)
    projs = F.array(
        *[
            F.round(_dot(F.col(vec_col), array_lit(row).cast("array<double>")), 6)
            for row in mat
        ]
    )
    return vectors.select(
        F.col(id_col), F.posexplode(projs).alias("dim_idx", "proj")
    ).select(F.col(id_col), F.col("dim_idx").cast("int").alias("dim_idx"), "proj")


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for every query vector, the ``k``
    most cosine-similar corpus vectors carrying a DIFFERENT label — the
    standard negatives-selection step when building contrastive /
    embedding-model training pairs (the "hard" negatives that sit close
    in embedding space but must be pushed apart). Returns
    ``(query_id, neighbor_id, neg_label, cosine_sim)`` with the shared
    deterministic ranking (:func:`rank_topk`: rounded score desc, id asc).

    Scale shape: same broadcast-queries pattern as
    :func:`brute_force_topk` — the corpus is never reshuffled, and the
    label-mismatch filter prunes the candidate stream BEFORE the rank
    window, so the per-query state is k rows. For corpora too large to
    scan per query batch, run the same filter over :func:`ivf_topk`
    candidates instead (mine hard negatives within probed cells).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col(label_col).alias("__qlab"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col(label_col).alias("neg_label"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & ~F.col("__qlab").eqNullSafe(F.col("neg_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
        )
    )
    return rank_topk(sims, k, "cosine_sim")


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over an embedding column.

    For every query vector: find the ``k`` nearest corpus vectors by exact
    cosine (:func:`brute_force_topk` — broadcast queries, corpus stays
    partition-local), attach their labels, and pick the label with the
    most votes (ties → smaller label). Returns
    ``(query_id, pred_label, n_votes, mean_sim)`` where ``mean_sim`` is
    the average similarity of the winning label's voters (4 dp).

    Scale shape: the only non-broadcast exchange is the per-query rank
    window inherited from the top-k, then a tiny |queries|×|labels|
    aggregate. The label attach is a corpus-side projection BEFORE top-k
    selection would be wasteful — labels join onto the k·|queries|
    winners instead.
    """
    topk = brute_force_topk(corpus, queries, k, id_col, vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lab")
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "__lab")
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            F.round(F.avg("cosine_sim"), 4).alias("mean_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("__lab").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__lab").cast("long").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
            "mean_sim",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): coefficients
    derived from md5 of (seed, plane, dim) — reproducible across runs,
    engines, and cluster sizes, like every other portable hash in the
    repo. Driver-side cost is ``n_planes × dim`` floats (a few KB)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:8]
            row.append((int(h, 16) / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH ANN — the LSH-bucketed alternative to
    :func:`ivf_topk` for cosine similarity. Each of ``n_tables`` hash
    tables buckets a vector by the sign pattern of ``n_planes`` random
    hyperplane projections (vectors within angle θ collide with
    probability ``(1 - θ/π)^n_planes`` per table); candidates are pairs
    sharing a bucket in ANY table, reranked by exact cosine. Same output
    shape/tie rules as :func:`brute_force_topk`. Tune by that formula:
    fewer planes / more tables raises recall at higher candidate cost
    (measured on the weakly-clustered synthetic embeddings: 8×6 → 0.14
    recall@5, 5×16 → 0.72, 4×16 → 0.94).

    Scale shape: bucketing is a narrow projection (hyperplanes inline as
    literals — no join, no broadcast variable); the candidate stage is an
    equi-join on ``(table, bucket)`` — linear in collisions, never
    all-pairs; rerank touches only candidates. Unlike IVF there is no
    training step and no centroid skew concern: bucket population is
    driven by the data's angular distribution, and adding tables trades
    compute for recall without re-indexing.
    """
    head = corpus.select(vec_col).first()
    if head is None:
        raise ValueError("lsh_cosine_topk: corpus is empty (no vectors)")
    dim = len(head[0])
    per_table = _hyperplanes(dim, n_planes * n_tables, seed)

    # ONE nested-array literal + higher-order functions, not n_tables ×
    # n_planes unrolled dot expressions: the unrolled form put ~4k literal
    # nodes and 64 aggregate trees in a single projection, and Catalyst
    # analysis + codegen of that tree dominated wall-clock (~9 s at
    # sf0.1); the HOF form carries the same numbers as ONE Literal and
    # loops at runtime — identical results (same fold order per dot, same
    # MSB-first bit fold), ~10× cheaper to plan
    planes_lit = array_lit(per_table)

    def buckets(df: DataFrame, out_id: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        tb = F.transform(
            F.sequence(F.lit(0), F.lit(n_tables - 1)),
            lambda t: F.struct(
                t.cast("int").alias("table"),
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    F.lit(0).cast("long"),
                    lambda bits, p: bits * 2
                    + (
                        F.aggregate(
                            F.zip_with(
                                vec,
                                F.element_at(planes_lit, t * n_planes + p + 1),
                                lambda x, y: x * y,
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        >= 0
                    ).cast("long"),
                ).alias("bucket"),
            ),
        )
        return df.select(
            F.col(id_col).alias(out_id),
            vec.alias(f"__{out_id}_vec"),
            F.explode(tb).alias("__tb"),
        ).select(out_id, f"__{out_id}_vec", "__tb.table", "__tb.bucket")

    c = buckets(corpus, "neighbor_id")
    q = buckets(queries, "query_id")
    # score BEFORE the dedup exchange: the cosine is row-local at the
    # broadcast-join output (no shuffle yet), and every duplicate of a
    # pair — one per shared table — scores identically, so deduping the
    # (ids, sim) rows yields the same relation as deduping the vectors
    # and scoring after. The dedup exchange then carries ~24 bytes/row
    # instead of two dim-length vectors (guide §2.3/§8: shuffle the
    # lightweight proxy, not the payload); a pair colliding in t tables
    # pays t row-local cosines in exchange — compute for shuffle bytes.
    sims = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__query_id_vec"), F.col("__neighbor_id_vec")), 6
            ).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return rank_topk(sims, k, "cosine_sim")


def corpus_diversity(
    vectors: DataFrame,
    vec_col: str = "embedding",
    unit: int = 1_000_000,
) -> DataFrame:
    """Mean pairwise cosine similarity of the WHOLE corpus — the
    embedding-diversity health metric a selection/mixing pipeline reads
    before and after curation (a collapsing corpus trends toward 1) —
    computed WITHOUT forming a single pair.

    The O(n²) sum of pairwise dots of unit vectors collapses to the
    algebraic identity  Σ_{i≠j} <u_i,u_j> = |Σ_i u_i|² − Σ_i |u_i|²,
    so the whole answer is ONE narrow posexplode + a dim-keyed aggregate
    (≤ dim rows out) + a dim-row reduce: O(n·d) work, one exchange on a
    uniform bounded key, zero joins — at 100 TB this is the difference
    between "runs in one pass" and "cannot run".

    Engine-exactness: each normalized coordinate is snapped to integer
    micro-units BEFORE any cross-row sum (float partial-sum order across
    partitions is the usual oracle-breaker), and the per-dim sums are
    squared in DECIMAL so ~1e23 intermediates stay exact. A single
    1-micro-unit snap flip moves the final mean by ~1e-12 — far inside
    the 6 dp rounding — so the metric is robust even at the floor
    boundaries. Zero-norm vectors are excluded (and counted)."""
    v = F.col(vec_col).cast("array<double>")
    nrm = _norm(v)
    d = (
        vectors.select(v.alias("__v"), nrm.alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            F.posexplode(
                F.transform(
                    "__v",
                    lambda x: F.floor(x / F.col("__n") * unit + 0.5).cast("long"),
                )
            ).alias("__dim", "__u")
        )
    )
    per_dim = d.groupBy("__dim").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.sum("__u").cast("decimal(20,0)").alias("__s"),
        F.sum(F.col("__u").cast("decimal(19,0)") * F.col("__u")).alias("__q"),
    )
    agg = per_dim.agg(
        F.max("__cnt").cast("long").alias("n_vectors"),
        F.sum(F.col("__s") * F.col("__s")).alias("__cross"),
        F.sum("__q").alias("__self"),
    )
    n = F.col("n_vectors").cast("double")
    num = (F.col("__cross") - F.col("__self")).cast("double")
    mean = num / (n * (n - 1.0)) / float(unit) / float(unit)
    return agg.select(
        "n_vectors",
        F.round(mean, 6).alias("mean_pairwise_cosine"),
    )


def embedding_norm_outliers(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Norm-based embedding outlier report ``(id, norm, z, is_outlier)``:
    vectors whose L2 norm sits more than ``z_threshold`` population
    standard deviations from the corpus mean — the cheap first-pass QA
    that catches truncated/zero/blown-up embeddings before they poison
    an ANN index or a centroid.

    Engine-exact at any partition count: norms snap to integer
    micro-units, the mean/variance come from EXACT integer sums
    (Σu in long range, Σu² in DECIMAL(38,0) — ~1e19 at 500k rows), and
    the only floating division is the final z itself. Plan: one map-only
    norm pass feeding one global aggregate (broadcast back as a 1-row
    literal join), no shuffle of the corpus."""
    u = F.floor(_norm(F.col(vec_col).cast("array<double>")) * 1_000_000 + 0.5).cast(
        "long"
    )
    normed = vectors.select(F.col(id_col), u.alias("__u")).localCheckpoint(eager=False)
    stats = normed.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__u").cast("decimal(38,0)").alias("__s"),
        F.sum(F.col("__u").cast("decimal(19,0)") * F.col("__u")).alias("__q"),
    ).select(
        F.col("__n").cast("double").alias("__nd"),
        (F.col("__s").cast("double") / F.col("__n").cast("double")).alias("__mean"),
        (
            (F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")).cast("double")
        ).alias("__nvar"),
    )
    z = F.when(
        F.col("__nvar") > 0,
        (F.col("__u") - F.col("__mean")) / F.sqrt(F.col("__nvar")) * F.col("__nd"),
    )
    return (
        normed.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (F.col("__u").cast("double") / 1_000_000).alias("norm"),
            F.round(z, 4).alias("z"),
        )
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("z")) > z_threshold, F.lit(False)),
        )
    )


def dim_ablation_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style dimension-ablation evaluation (r8): for each
    prefix length in ``dims``, exact cosine top-``k`` over the TRUNCATED
    embeddings, scored as recall against the full-dimension top-``k``
    ground truth — the measurement behind "can we store/search 16 of the
    64 dims" decisions (Kusupati et al. 2022's MRL evaluation, and the
    ablation FAISS users run before picking an OPQ/PCA output size).

    Output, one row per ablation: ``(dim, n_queries, n_hits,
    recall_bp)`` with ``recall_bp = trunc(n_hits·10000 / (n_queries·k))``
    — integer arithmetic end-to-end on top of the established
    round-6-decimal cosine contract, so the whole evaluation is
    engine-exact.

    Scale shape: an EVAL op — queries are a broadcast-sized sample by
    contract; each ablation is one broadcast-join pass over the corpus
    (|dims| + 1 passes total) feeding per-query top-k windows; the
    ground-truth relation is computed once and lineage-truncated. A
    full-corpus production ablation would swap the brute-force arm for
    the persisted IVF index per dim; this is the exact baseline that
    validates it.
    """
    if not dims:
        raise ValueError("dim_ablation_recall: dims must be non-empty")
    if any(d < 1 for d in dims):
        raise ValueError("dim_ablation_recall: dims must be >= 1")
    full = (
        brute_force_topk(corpus, queries, k, id_col, vec_col)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)  # feeds every ablation join
    )
    base = full.groupBy().agg(
        F.countDistinct("query_id").cast("long").alias("n_queries")
    )
    parts = []
    for d in sorted(dims):
        tc = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        tq = queries.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        hits = (
            brute_force_topk(tc, tq, k, id_col, vec_col)
            .select("query_id", "neighbor_id")
            .join(full, ["query_id", "neighbor_id"])
            .groupBy()
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(F.lit(d).cast("long").alias("dim"), "n_hits")
        )
        parts.append(hits)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.crossJoin(F.broadcast(base)).select(
        "dim",
        "n_queries",
        "n_hits",
        # greatest(,1): an empty query sample (every query filtered out
        # upstream) reports recall 0 instead of dividing by zero
        F.expr(f"(n_hits * 10000) div greatest(n_queries * {k}, 1)")
        .cast("long")
        .alias("recall_bp"),
    )
