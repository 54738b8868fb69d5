"""N-gram language-model scoring: train bigram counts on a corpus, score
documents by per-token negative log-likelihood (≈ log-perplexity).

The KenLM-style quality signal used throughout public data-curation
pipelines (CCNet, Gopher, RedPajama all filter on LM perplexity):
documents whose token sequences are improbable under a reference corpus
are boilerplate, gibberish, or the wrong language. Whole pipeline stays
relational — the "model" IS a DataFrame of counts, trainable on one
corpus and applied to another (the cross-corpus shape: train on a clean
reference, score a dirty crawl).

Smoothing: add-one (Laplace) over the observed vocabulary —
``p(w|v) = (c(v,w) + 1) / (c(v) + |V|)``. Deterministic, closed-form,
and exactly mirrorable in SQL; heavier smoothing (Kneser-Ney) needs
multi-pass discounting that buys little for a FILTERING signal.

Scale shape: training is two hash aggregates over exploded bigrams
(uniform token keys, map-side partials). Scoring joins each document
bigram against the count tables — both sides keyed by token/bigram, and
the model side is Zipf-small after aggregation (vocab², observed part
only; unseen bigrams fall through the LEFT join to the smoothed floor).
Per-token log terms snap to integer micro-units before the per-doc sum,
so scores are order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = [
    "train_bigram_lm",
    "score_documents_lm",
    "perplexity_buckets",
    "collocations",
]


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, word) for every adjacent token pair; the leading token
    pairs with the sentinel ``<s>`` so position 0 is also scored."""
    toks = df.select(
        F.col(id_col), norm_tokens(text_col).alias("__t")
    ).filter(F.size("__t") > 0)
    shifted = F.concat(F.array(F.lit("<s>")), F.col("__t"))
    return toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(shifted, 1, F.size("__t")),
                F.col("__t"),
                lambda p, w: F.struct(p.alias("prev"), w.alias("word")),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.prev").alias("prev"), F.col("__bg.word").alias("word"))


def train_bigram_lm(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
) -> dict[str, DataFrame]:
    """Fit the count model. Returns three small-after-aggregation frames:
    ``bigrams (prev, word, c_bg)``, ``unigrams (prev, c_prev)``, and the
    1-row ``vocab (v_size)`` (distinct WORDS, excluding the sentinel).

    The corpus is tokenized ONCE: unigrams and vocab derive from the
    aggregated (Zipf-small) bigram relation, which is persisted by
    default so the three frames and every later scoring job reuse it —
    the build-once / apply-many shape of the persisted IVF index. The
    caller owns the cache lifecycle (``model["bigrams"].unpersist()``);
    pass ``cache=False`` when immediately writing the model to parquet.
    """
    bg = _bigrams(corpus, id_col, text_col)
    bigrams = bg.groupBy("prev", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c_bg")
    )
    if cache:
        bigrams = bigrams.persist()
    # derived from the SMALL aggregate, not the raw bigram stream: these
    # cost |observed pairs| rows, not another corpus pass
    unigrams = bigrams.groupBy("prev").agg(
        F.sum("c_bg").cast("long").alias("c_prev")
    )
    vocab = bigrams.agg(F.countDistinct("word").cast("long").alias("v_size"))
    return {"bigrams": bigrams, "unigrams": unigrams, "vocab": vocab}


def score_documents_lm(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every non-empty document against a :func:`train_bigram_lm`
    model. Output ``(doc_id, n_tokens, nll)`` — ``nll`` is the mean
    per-token negative log-likelihood under add-one smoothing (lower =
    more fluent under the training corpus; ``exp(nll)`` is perplexity).

    Per-token ``-ln p`` values snap to integer micro-units before the
    per-doc mean, then the floor rule rounds the mean — order-independent
    and engine-exact. Unseen contexts/words degrade to the smoothed
    floor via LEFT joins (never dropped rows, never nulls in the sum).
    """
    # empty model guard: v_size = 0 would make every smoothed p = 1/0 =
    # +inf and each token's nll snap to LONG_MIN — garbage scores instead
    # of an error. The 1-row check is a sanctioned driver hop (cheap when
    # the model is cached / loaded from parquet).
    vs_row = model["vocab"].first()
    if vs_row is None or not vs_row["v_size"]:
        raise ValueError(
            "score_documents_lm: empty model (training corpus had no "
            "tokens) — scores would be meaningless"
        )
    bg = _bigrams(docs, id_col, text_col)
    # no broadcast hint on the count tables: a reference-corpus model can
    # exceed the broadcast budget (observed-vocab² rows); AQE picks
    # broadcast when the aggregated side is actually small. The 1-row
    # vocab frame is always a broadcast.
    scored = (
        bg.join(model["bigrams"], ["prev", "word"], "left")
        .join(model["unigrams"], ["prev"], "left")
        .crossJoin(F.broadcast(model["vocab"]))
    )
    c_bg = F.coalesce(F.col("c_bg"), F.lit(0)).cast("double")
    c_prev = F.coalesce(F.col("c_prev"), F.lit(0)).cast("double")
    p = (c_bg + F.lit(1.0)) / (c_prev + F.col("v_size").cast("double"))
    nll_u = F.floor(-F.log(p) * 1000000 + 0.5).cast("long")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(nll_u).cast("long").alias("__nll_u"),
    )
    mean = F.col("__nll_u").cast("double") / F.col("n_tokens").cast("double") / 1000000.0
    return per_doc.select(
        id_col,
        "n_tokens",
        (F.floor(mean * 1000000 + 0.5).cast("double") / 1000000.0).alias("nll"),
    )


def perplexity_buckets(
    docs: DataFrame,
    model: dict[str, DataFrame],
    by: str | None = None,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet's head/middle/tail split: score documents against the
    reference model (:func:`score_documents_lm`), then cut each ``by``
    group into ``n_buckets`` equal-count perplexity bands — bucket 1 =
    lowest ``nll`` (most reference-like). CCNet keeps *head+middle* and
    drops *tail* per language; the per-group cut is the whole point (an
    absolute nll threshold would empty low-resource domains).

    Output ``(doc_id[, by], n_tokens, nll, bucket, band)`` — ``band``
    names the 3-bucket case ``head``/``middle``/``tail``, and is the
    bucket number as a string otherwise. Determinism: NTILE over the
    total order ``(nll, doc_id)`` — both engines share the ANSI NTILE
    fill rule (first ``rows % n`` buckets take the extra row).

    The ``by`` columns ride along via a second NARROW scan of ``docs``
    (id + group only — the token_budget_fill discipline: a projected
    re-scan beats checkpointing something corpus-sized). Scale note: the
    NTILE window sorts each group on one executor — fine for per-domain
    corpora; at the 100 TB extreme, cut at quantile sketch boundaries
    instead (``datapipe/analytics.py`` grouped quantile sketch) and
    broadcast the ≤|groups|·n_buckets cutpoints.
    """
    if n_buckets < 2:
        raise ValueError("perplexity_buckets: need n_buckets >= 2")
    scored = score_documents_lm(docs, model, id_col, text_col)
    group_cols: list[str] = []
    if by is not None:
        scored = scored.join(docs.select(id_col, by), id_col)
        group_cols = [by]
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("nll").asc(), F.col(id_col).asc()
    )
    bucket = F.ntile(n_buckets).over(w).cast("long")
    if n_buckets == 3:
        band = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        band = F.col("bucket").cast("string")
    out_cols = [id_col, *group_cols, "n_tokens", "nll"]
    return scored.withColumn("bucket", bucket).select(
        *out_cols, "bucket", band.alias("band")
    )


def collocations(
    corpus: DataFrame,
    min_count: int = 5,
    top_k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Statistically-associated adjacent word pairs by pointwise mutual
    information — the phrase-mining pass ("new york", "machine learning")
    run before tokenizer training or query expansion. PMI =
    ``ln(p(v,w) / (p(v)·p(w)))`` with all probabilities from adjacent-
    pair position counts (the sentinel row is excluded: document starts
    are not collocations).

    Output ``(prev, word, n_pair, pmi)`` for pairs seen ≥ ``min_count``
    times; ``pmi`` at 6 dp (floor rule), ranked desc (pmi, then pair)
    when ``top_k`` is set. Rare-pair noise is what ``min_count`` is for —
    PMI famously explodes on hapax pairs.

    Scale shape: one exploded-bigram aggregate + two Zipf-small unigram
    aggregates joined onto the (min_count-filtered, so tiny) pair
    relation. The filter runs BEFORE the joins — only surviving pairs
    pay join cost.
    """
    bg = _bigrams(corpus, id_col, text_col).filter(F.col("prev") != "<s>")
    pairs = (
        bg.groupBy("prev", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    left = bg.groupBy("prev").agg(F.count(F.lit(1)).cast("long").alias("n_prev"))
    right = bg.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n_word"))
    total = bg.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    j = (
        pairs.join(left, "prev")
        .join(right, "word")
        .crossJoin(F.broadcast(total))
    )
    n = F.col("n_total").cast("double")
    pmi = F.log(
        (F.col("n_pair").cast("double") / n)
        / (
            (F.col("n_prev").cast("double") / n)
            * (F.col("n_word").cast("double") / n)
        )
    )
    out = j.select(
        "prev",
        "word",
        "n_pair",
        (F.floor(pmi * 1000000 + 0.5).cast("double") / 1000000.0).alias("pmi"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("pmi").desc(), F.col("prev").asc(), F.col("word").asc()
        ).limit(top_k)
    return out
