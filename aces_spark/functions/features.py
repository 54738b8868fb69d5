"""ML feature engineering over cohort-extraction output (beyond-reference,
per the brief's training-data-pipeline mandate).

The reference stops at the label frame (``run.py`` writes MEDS labels); a
training pipeline then needs model-ready features. This module turns the
engine's output into them, staying JVM-side:

* :func:`flatten_window_summaries` — explode each ``{node}_summary`` struct
  into flat numeric columns (per-window predicate counts + window duration
  in seconds): the tabular feature frame.
* :func:`assemble_feature_vectors` — ``pyspark.ml`` VectorAssembler over
  those columns → a ``features`` vector column ready for any MLlib
  estimator (logistic regression on the label, GBTs, ...).
* :func:`tfidf_features` — Tokenizer → HashingTF → IDF over a text column
  (documents table), the standard sparse-text baseline.
* :func:`mllib_minhash_dup_pairs` — MinHashLSH ``approxSimilarityJoin`` as
  the MLlib-native alternative to ``datapipe.dedup.minhash_lsh_pairs``
  (same contract: near-dup pairs under Jaccard distance).

Scale notes: flattening is a pure projection (no shuffle); VectorAssembler
is a row-local transform; HashingTF/IDF shuffle once for the document-
frequency aggregate; MinHashLSH's join shuffles on hash buckets — identical
shape to the hand-rolled LSH band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .litfast import array_lit


def flatten_window_summaries(result: DataFrame, duration: bool = True) -> DataFrame:
    """Flatten every ``{node}_summary`` struct column of a query() result
    into ``{window}__{predicate}`` count columns (plus
    ``{window}__duration_s`` when ``duration``). Window-name metadata and
    the raw structs are dropped; id/label/timestamp columns pass through."""
    flat_cols = []
    for field in result.schema.fields:
        name = field.name
        if not name.endswith("_summary"):
            flat_cols.append(F.col(f"`{name}`"))
            continue
        node = name[: -len("_summary")]
        prefix = node.replace(".", "_")
        sub = [f.name for f in field.dataType.fields]
        for sf in sub:
            if sf == "window_name":
                continue
            if sf in ("timestamp_at_start", "timestamp_at_end"):
                continue
            flat_cols.append(F.col(f"`{name}`.`{sf}`").alias(f"{prefix}__{sf}"))
        if duration:
            dur_us = F.unix_micros(F.col(f"`{name}`.`timestamp_at_end`")) - F.unix_micros(
                F.col(f"`{name}`.`timestamp_at_start`")
            )
            flat_cols.append(
                (dur_us.cast("double") / F.lit(1_000_000.0)).alias(f"{prefix}__duration_s")
            )
    return result.select(*flat_cols)


def assemble_feature_vectors(
    flat: DataFrame,
    feature_cols: list[str] | None = None,
    output_col: str = "features",
) -> DataFrame:
    """VectorAssembler over the numeric feature columns (default: every
    double/long column except ids/labels) → ``features`` vector column."""
    from pyspark.ml.feature import VectorAssembler

    if feature_cols is None:
        skip = {"subject_id", "label", "trigger", "index_timestamp"}
        feature_cols = [
            f.name
            for f in flat.schema.fields
            if f.name not in skip and f.dataType.typeName() in ("long", "double", "integer", "float")
        ]
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol=output_col, handleInvalid="keep"
    )
    return assembler.transform(flat)


def cohort_feature_vectors(result: DataFrame) -> DataFrame:
    """query() output → (subject_id, trigger, label?, features vector):
    the end-to-end cohort-to-training-set hop."""
    flat = flatten_window_summaries(result)
    vec = assemble_feature_vectors(flat)
    keep = [c for c in ("subject_id", "trigger", "index_timestamp", "label") if c in vec.columns]
    return vec.select(*keep, "features")


def tfidf_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1 << 14,
) -> DataFrame:
    """Tokenizer → HashingTF → IDF pipeline over a text column. Returns
    ``(id_col, tfidf)`` with a sparse vector column."""
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="__tokens", pattern="[^a-z0-9]+").setToLowercase(True)
    tf = HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=num_features)
    tokens = tok.transform(docs.select(id_col, text_col))
    tfv = tf.transform(tokens)
    idf = IDF(inputCol="__tf", outputCol="tfidf").fit(tfv)
    return idf.transform(tfv).select(id_col, "tfidf")


def tfidf_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact (collision-free) TF-IDF over normalized word tokens, computed
    with pure DataFrame ops — no feature hashing, so a SQL oracle can
    reproduce every value bit-for-bit (HashingTF's murmur3 bucketing in
    :func:`tfidf_features` is not engine-portable; that MLlib pipeline is
    pytest-covered instead).

    ``idf = ln((N + 1) / (df + 1))`` — MLlib ``IDF``'s formula with
    ``minDocFreq=0`` — where N counts ALL input docs (including token-less
    ones, matching MLlib's row count). Returns
    ``(doc_id, term, tf, tfidf)`` with ``tf`` BIGINT and ``tfidf`` rounded
    to 6 dp.

    Scale shape: explode → hash-aggregate by (doc, term) → per-term doc
    frequency as a window over ``term`` (tf rows are unique per (doc, term),
    so a plain count is the doc frequency). The shuffle key is the term;
    heavy-hitter terms are the same boilerplate story as
    ``ngram_jaccard_pairs`` and can be capped upstream. N arrives as a
    broadcast 1-row aggregate, not a driver-side collect.
    """
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    tokens = F.when(
        F.length(normalized) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(normalized, " "))
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    doc_freq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    return (
        tf.withColumn("__df", doc_freq)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("__n") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )


def mllib_minhash_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    num_hash_tables: int = 8,
    num_features: int = 1 << 14,
) -> DataFrame:
    """MinHashLSH ``approxSimilarityJoin`` near-dup pairs: the MLlib-native
    scale path (same contract as ``datapipe.dedup.minhash_lsh_pairs``).
    Returns ``(doc_a, doc_b, jaccard_dist)`` with ``doc_a < doc_b``;
    ``threshold`` is a Jaccard *distance* ceiling."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="__tokens", pattern="[^a-z0-9]+").setToLowercase(True)
    tokens = tok.transform(docs.select(id_col, text_col)).filter(F.size("__tokens") > 0)
    cv = CountVectorizer(inputCol="__tokens", outputCol="__tf", binary=True, vocabSize=num_features).fit(
        tokens
    )
    # tokens were non-empty and the vocab is fitted on this same data, so
    # every vector has ≥1 non-zero entry (MinHashLSH's requirement)
    tfv = cv.transform(tokens)
    lsh = MinHashLSH(inputCol="__tf", outputCol="__hashes", numHashTables=num_hash_tables, seed=13).fit(
        tfv
    )
    joined = lsh.approxSimilarityJoin(tfv, tfv, threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def rank_normalize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "pct_bp",
) -> DataFrame:
    """Per-group rank normalization: each row's percentile rank within
    its group in INTEGER basis points — ``(rank − 1) · 10000 div
    (n − 1)`` with competition ranking (ties share a rank), single-row
    groups pinned to 0. The distribution-free feature transform
    (quantile/rank normalization) that makes heavy-tailed columns
    comparable across groups before training.

    Engine-exact by construction: rank and group size are integers, the
    scale is one integer floor-division on non-negative operands (Spark
    trunc ≡ DuckDB floor), and tie handling is data-determined (no
    row_number over equal keys). One exchange on the group key, shared
    by both windows.

    NULL values get a NULL percentile and are excluded from the group
    size: ranking is ordered NULLS LAST on both engines (Spark's default
    NULLS-FIRST ascending disagrees with DuckDB's NULLS-LAST and would
    shift every non-null rank), and ``n`` counts only non-null values —
    engine-portable null semantics instead of order-dependent ones. The
    ``div`` expression references only FIXED internal column names, so a
    non-identifier ``out_col`` (spaces, quotes) cannot break or inject
    into the SQL fragment.
    """
    rk = F.rank().over(
        Window.partitionBy(key_col).orderBy(F.col(value_col).asc_nulls_last())
    )
    n = F.count(F.col(value_col)).over(Window.partitionBy(key_col))
    pct = (
        F.when(F.col(value_col).isNull(), F.lit(None).cast("long"))
        .when(
            F.col("__rknorm_n") > 1,
            F.expr("((__rknorm_rk - 1) * 10000) div (__rknorm_n - 1)"),
        )
        .otherwise(F.lit(0))
    )
    return (
        df.withColumn("__rknorm_rk", rk.cast("long"))
        .withColumn("__rknorm_n", n.cast("long"))
        .withColumn(out_col, pct.cast("long"))
        .drop("__rknorm_rk", "__rknorm_n")
    )


def feature_hashing(
    docs: DataFrame,
    n_buckets: int = 1 << 10,
    signed: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009) over normalized word
    tokens with an engine-portable hash: each term lands in
    ``md5-derived hash mod n_buckets``; with ``signed`` a second hash
    bit flips the contribution's sign, which unbiases the inner product
    under collisions (E[collision noise] = 0 — the vowpal-wabbit trick).
    Returns the sparse features ``(doc_id, bucket, value)`` — BIGINT
    value = Σ ±tf, zero-sum buckets kept (they are real feature values,
    and dropping them would make the sign trick unobservable to tests).

    Unlike :func:`tfidf_features` (MLlib ``HashingTF``, murmur3 —
    fastest, but not reproducible outside the JVM) this uses the repo's
    md5 recipe, so the exact feature matrix is verifiable by any SQL
    engine and stable across Spark versions — the property that matters
    when features feed a model TRAINED elsewhere.

    Scale shape: map-only tokenize/hash + ONE (doc, bucket) aggregate —
    no joins, no vocabulary state (the point of hashing: no fit step,
    new terms at inference hash to the same place).
    """
    from ..datapipe.text import norm_tokens
    from .hashing import md5_long60

    if n_buckets < 1:
        raise ValueError("feature_hashing: n_buckets must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(norm_tokens(text_col)).alias("term")
    )
    h = md5_long60(F.col("term"))
    bucket = F.pmod(h, F.lit(int(n_buckets))).cast("long")
    # bit 59 (top of the 60-bit hash) decides the sign — independent of
    # the low bits the bucket uses for any n_buckets < 2^59; bitwise AND
    # is integer-exact in every engine (a double division here would hit
    # 53-bit mantissa rounding AND Spark-truncate-vs-SQL-round casts)
    sign = F.when(h.bitwiseAND(F.lit(1 << 59)) != 0, F.lit(-1)).otherwise(F.lit(1))
    contrib = sign if signed else F.lit(1)
    return (
        toks.groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.sum(contrib).cast("long").alias("value"))
    )


def linear_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 10,
    bias_micro: int = 0,
    signed: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
) -> DataFrame:
    """fastText-style linear text-classifier INFERENCE (Joulin et al.
    2017's deployment half): score each document against an externally
    trained hashed bag-of-words model. ``weights`` is the model —
    ``(bucket: long, weight_micro: long)``, weights in integer
    micro-units, sparse (missing buckets score 0). Output
    ``(doc_id, score_micro, label)`` with ``score_micro = bias_micro +
    Σ_token ±weight_micro[bucket(token)]`` and ``label = score >= 0``.

    The feature recipe is :func:`feature_hashing`'s, bit for bit (60-bit
    md5 → bucket = h mod n_buckets, sign = bit 59) — the whole point of
    the hashing trick at deploy time: NO vocabulary ships with the
    model, a term never seen in training hashes to the same bucket it
    would have trained into, and the engine-portable hash means the
    model can be trained on the sparse matrix `feature_hashing` exports
    and served here with zero skew between the two. Scores are exact
    int64 sums — order-free, bit-identical at any partition count.

    Scale shape: map-only tokenize/hash → broadcast LEFT join against
    the ≤``n_buckets``-row model → ONE per-doc aggregate. The corpus is
    never shuffled except on ``doc_id`` for the final sum;
    ``explode_outer`` keeps empty documents in the frame (they score
    exactly ``bias_micro``) without a second corpus-sized join back.

    ``features``: a precomputed :func:`feature_hashing` relation for
    exactly these ``docs`` (same ``n_buckets``/``signed``, unique ids) —
    the train-then-score shape, where training just persisted that
    matrix: scoring then skips the whole tokenize/hash pass (the score
    is bilinear, so Σ_token ±w = Σ_bucket value·w, the identical
    integer) and restores token-less docs via a narrow id join.
    """
    from ..datapipe.text import norm_tokens
    from .hashing import md5_long60

    if n_buckets < 1:
        raise ValueError("linear_classifier_score: n_buckets must be >= 1")
    if features is not None:
        # score off a precomputed :func:`feature_hashing` relation for
        # exactly these docs (train-then-score shares ONE tokenize/hash
        # pass — the matrix is what training just persisted): the score
        # is bilinear, Σ_token ±w[bucket] = Σ_bucket value·w[bucket], so
        # the per-doc sum over the matrix is the identical integer.
        # Token-less docs have no matrix rows, so a NARROW id join-back
        # restores them at bias_micro — ids only, not the corpus text
        # the token path re-reads.
        sums = (
            features.select(
                "doc_id",
                F.col("bucket").cast("long").alias("__b"),
                F.col("value").cast("long").alias("__v"),
            )
            .join(
                F.broadcast(
                    weights.select(
                        F.col("bucket").cast("long").alias("__b"),
                        F.col("weight_micro").cast("long"),
                    )
                ),
                "__b",
                "left",
            )
            .groupBy("doc_id")
            .agg(
                F.coalesce(F.sum(F.col("__v") * F.col("weight_micro")), F.lit(0))
                .cast("long")
                .alias("__s")
            )
        )
        return (
            docs.select(F.col(id_col).alias("doc_id"))
            .join(sums, "doc_id", "left")
            .select(
                "doc_id",
                (F.coalesce(F.col("__s"), F.lit(0)) + F.lit(int(bias_micro)))
                .cast("long")
                .alias("score_micro"),
            )
            .withColumn("label", F.col("score_micro") >= 0)
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(norm_tokens(text_col)).alias("term"),
    )
    h = md5_long60(F.col("term"))
    bucket = F.pmod(h, F.lit(int(n_buckets))).cast("long")
    sign = F.when(h.bitwiseAND(F.lit(1 << 59)) != 0, F.lit(-1)).otherwise(F.lit(1))
    scored = toks.select("doc_id", bucket.alias("__b"), sign.alias("__sign")).join(
        F.broadcast(
            weights.select(
                F.col("bucket").cast("long").alias("__b"),
                F.col("weight_micro").cast("long"),
            )
        ),
        "__b",
        "left",
    )
    per_tok = (F.col("__sign") if signed else F.lit(1)) * F.col("weight_micro")
    return (
        scored.groupBy("doc_id")
        .agg(
            (
                F.coalesce(F.sum(per_tok), F.lit(0)) + F.lit(int(bias_micro))
            )
            .cast("long")
            .alias("score_micro")
        )
        .withColumn("label", F.col("score_micro") >= 0)
    )


_SIGMOID_TABLE_SIZE = 256
_SIGMOID_RANGE = 8  # table covers margins in [-8, 8] (pre-micro units)


def sigmoid_table_micro() -> list[int]:
    """The fastText-style precomputed sigmoid lookup table (Joulin et al.
    2017 ship a 512-entry table over [-8, 8]; we use 256): entry ``i`` is
    ``round(sigmoid(-8 + 16·i/255) · 1e6)`` as an exact integer.

    Training uses THIS table instead of calling ``exp`` inside the plan
    so the trained model is bit-identical across engines: ``exp`` may
    differ by an ulp between libm implementations, and one flipped
    micro-unit in an early residual cascades through every later
    iteration. The table is computed ONCE in driver-side Python and
    embedded as integer literals in both the Spark plan and the DuckDB
    oracle, so both engines look up the same integers."""
    import math

    n = _SIGMOID_TABLE_SIZE
    out = []
    for i in range(n):
        x = -_SIGMOID_RANGE + 2.0 * _SIGMOID_RANGE * i / (n - 1)
        out.append(math.floor(1.0 / (1.0 + math.exp(-x)) * 1_000_000 + 0.5))
    return out


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the Spark ``div`` /
    DuckDB ``//`` convention (Python's ``//`` floors, which differs for
    negative numerators)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def train_linear_classifier(
    labeled_docs: DataFrame,
    n_buckets: int = 1 << 10,
    n_iters: int = 3,
    lr_bp: int = 10000,
    signed: bool = True,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    cache_registry: list | None = None,
) -> DataFrame:
    """fastText-style linear text-classifier TRAINING (the other half of
    :func:`linear_classifier_score`; reference parity: the quality
    classifiers CCNet / Gopher / LLaMA train over hashed bag-of-words
    features): fixed-iteration full-batch logistic regression by
    integer-exact gradient descent over :func:`feature_hashing`'s sparse
    matrix. Returns the model as ``(bucket, weight_micro)`` — sparse,
    zero-weight buckets dropped — the exact contract
    :func:`linear_classifier_score` consumes, so train-here / serve-here
    round-trips with zero feature skew.

    Determinism (what makes a hash-exact cross-engine oracle possible):
    every cross-row sum is an integer sum (order-free at any partition
    count); the sigmoid is the precomputed integer lookup table
    :func:`sigmoid_table_micro` (fastText's own trick — no in-plan
    ``exp``); the weight update ``w += (lr_bp · grad) div (10000 · n)``
    uses truncate-toward-zero division on exact Python ints. Two runs at
    any parallelism produce bit-identical models.

    Per iteration ``t``: margin_i = Σ_b x_ib·w_b (exact int64 micro);
    p_i = table[clamp(margin)]; residual r_i = y_i·1e6 − p_i;
    grad_b = Σ_i x_ib·r_i (DECIMAL-exact); w_b += lr·grad_b/n. This is
    batch gradient ascent on the log-likelihood — 3 iterations from
    w=0 separates any linearly separable planted corpus and is the
    determinism-friendly stand-in for fastText's epoch loop.

    Scale shape (the parameter-server pattern, driver as the server):
    the CORPUS is never collected — each iteration is one broadcast join
    of the ≤``n_buckets``-row model against the persisted sparse feature
    relation, a per-doc integer aggregate, and a per-bucket integer
    aggregate whose ≤``n_buckets``-row result is what travels to the
    driver. Features are computed once and localCheckpoint-persisted
    (the twice-per-iteration reuse discipline `tools/plan_audit.py`
    enforces). At 100 TB: n_iters scans of a bucketed sparse matrix,
    model I/O is KBs per iteration.
    """
    if n_buckets < 1:
        raise ValueError("train_linear_classifier: n_buckets must be >= 1")
    if n_iters < 1:
        raise ValueError("train_linear_classifier: n_iters must be >= 1")
    spark = labeled_docs.sparkSession

    # repartition on doc_id BEFORE caching: every iteration both
    # aggregates margins by doc_id and joins residuals by doc_id, so
    # persisting the matrix already hashed on doc_id removes the
    # per-iteration 2x reshuffle of the (corpus-sized) feature relation.
    # persist() (not localCheckpoint) is load-bearing here: a checkpointed
    # RDD scans back as UnknownPartitioning and the planner re-shuffles
    # the matrix around EVERY per-iteration aggregate/join anyway (r10
    # plan ledger: 2 corpus-sized exchanges per iteration), while a
    # cached plan keeps the hash(doc_id) output partitioning visible —
    # provided canChangeCachedPlanOutputPartitioning stays enabled (same
    # conf query.py sets for the window-tree cache, guide §2.4).
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
    except Exception:  # pragma: no cover - conf may be static on some builds
        pass
    feats = (
        feature_hashing(
            labeled_docs, n_buckets=n_buckets, signed=signed,
            text_col=text_col, id_col=id_col,
        )
        .repartition("doc_id")
        .persist()
    )
    # cache_registry (the miners' contract): hand the persisted feature
    # matrix to the caller and SKIP the end-of-training unpersist, so a
    # train-then-score pipeline can feed it to linear_classifier_score's
    # ``features`` path — one tokenize/hash pass for the whole query.
    # The caller owns the release.
    if cache_registry is not None:
        cache_registry.append(feats)
    labels = (
        labeled_docs.select(
            F.col(id_col).alias("doc_id"),
            (F.col(label_col).cast("boolean").cast("long") * 1_000_000)
            .alias("__y_micro"),
        )
        .persist()
    )
    n_docs = labels.count()
    if n_docs == 0:
        if cache_registry is None:
            feats.unpersist(False)
        labels.unpersist(False)
        return spark.createDataFrame([], "bucket long, weight_micro long")

    table = sigmoid_table_micro()
    # one JVM parse for the 256-entry table, not one py4j trip per entry
    tbl_arr = array_lit(table)
    rng_micro = _SIGMOID_RANGE * 1_000_000

    weights: dict[int, int] = {}
    denom = 10000 * n_docs
    for _ in range(n_iters):
        if weights:
            wdf = spark.createDataFrame(
                list(weights.items()), "bucket long, weight_micro long"
            )
            margins = (
                feats.join(F.broadcast(wdf), "bucket", "left")
                .groupBy("doc_id")
                .agg(
                    F.sum(
                        F.col("value") * F.coalesce(F.col("weight_micro"), F.lit(0))
                    )
                    .cast("long")
                    .alias("__m")
                )
            )
            m = F.coalesce(F.col("__m"), F.lit(0))
            m_c = F.greatest(F.least(m, F.lit(rng_micro)), F.lit(-rng_micro))
            idx = F.expr(
                f"((__mc + {rng_micro}) * {_SIGMOID_TABLE_SIZE - 1})"
                f" div {2 * rng_micro}"
            )
            resid = (
                labels.join(margins, "doc_id", "left")
                .withColumn("__mc", m_c)
                .select(
                    "doc_id",
                    (
                        F.col("__y_micro")
                        - F.element_at(tbl_arr, (idx + 1).cast("int"))
                    ).alias("__r_micro"),
                )
            )
        else:
            # w = 0 (always iteration 0, and any later iteration whose
            # update rounded every weight away): every margin is exactly
            # 0, so the sigmoid is ONE table constant — computing it in
            # the driver skips a full broadcast-join + per-doc aggregate
            # pass over the persisted feature matrix (guide §2.1: the
            # pass computed a value known before it ran). The index
            # arithmetic below is the same integer expression the
            # in-plan path evaluates at __mc = 0.
            p0 = table[(rng_micro * (_SIGMOID_TABLE_SIZE - 1)) // (2 * rng_micro)]
            resid = labels.select(
                "doc_id", (F.col("__y_micro") - F.lit(p0)).alias("__r_micro")
            )
        grads = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.col("value").cast("decimal(19,0)") * F.col("__r_micro")
                ).alias("__g")
            )
            .collect()
        )
        for row in grads:
            g = int(row["__g"])
            if g:
                b = int(row["bucket"])
                weights[b] = weights.get(b, 0) + _tdiv(lr_bp * g, denom)

    if cache_registry is None:
        feats.unpersist(False)
    labels.unpersist(False)
    items = sorted((b, w) for b, w in weights.items() if w != 0)
    if not items:
        return spark.createDataFrame([], "bucket long, weight_micro long")
    return spark.createDataFrame(items, "bucket long, weight_micro long")
