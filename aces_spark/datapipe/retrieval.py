"""Lexical retrieval over a document corpus: BM25 scoring.

The sparse-retrieval half of a training-data search stack (the dense half
is ``datapipe.similarity``): given a bag of query terms, rank documents by
Okapi BM25 — the Lucene/Elasticsearch default scoring function. Used in
data curation for targeted corpus slicing ("find documents about X to
up/down-sample") and for building retrieval-augmented training pairs.

Reference semantics: Robertson & Zaragoza 2009 (the BM25 survey) with
Lucene's non-negative idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Scale shape: the per-term statistics restrict to the QUERY's terms before
any join (the term filter prunes the exploded token stream immediately —
at 100 TB the per-term relation is |matching postings|, not |all
postings|); document lengths need one doc-keyed aggregate over the full
token stream (the unavoidable full pass — Lucene precomputes the same
statistic at index time); the corpus-wide N / avgdl reduce to a 1-row
broadcast. No Python UDFs, no driver loops.

Determinism rule: each (doc, term) score contribution is snapped to
integer MICRO-units (``floor(x*1e6 + 0.5)`` as BIGINT) before the
per-doc sum, so the total is an order-independent integer in any engine
and at any parallelism — the same trick as the repo's DECIMAL sums —
and the top-k ranking compares integers (doc id tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = ["bm25_scores", "phrase_match", "dirichlet_ql_scores"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document containing at least one query term.

    Output ``(doc_id, n_matched_terms, score)`` — ``score`` is the BM25
    sum in micro-unit precision (a multiple of 1e-6, exact in double);
    with ``top_k`` set, only the k best documents survive (score-desc,
    id-asc tie-break, ranked on the integer micro-units).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(
        F.col(id_col), F.explode(norm_tokens(text_col)).alias("term")
    )
    # ONE pass, one doc-keyed aggregate (r10, guide §2.3/§2.4): dl and
    # every query term's tf come out of the same conditional aggregation,
    # so the corpus is tokenized once and the former tf ⋈ dl doc-keyed
    # join disappears — a query is a FIXED small term list, so the agg is
    # |terms| counter columns wide, map-side combined. The previous shape
    # tokenized twice (full-stream dl agg + filtered tf agg) and joined
    # the halves back on doc_id.
    per_doc_tf = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).cast("long").alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    # corpus stats (n_docs, avgdl) AND each term's document frequency
    # reduce to ONE row over that aggregate and broadcast onto the scoring
    # projection — df_t is just "how many docs have tf_t > 0"
    stats = per_doc_tf.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.count(F.when(F.col(f"__tf_{i}") > 0, 1))
            .cast("long")
            .alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )

    # melt to (doc, term, tf, df) rows — query-term-sized, row-local
    melted = (
        per_doc_tf.crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "dl",
            "n_docs",
            "avgdl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"__tf_{i}").alias("tf"),
                            F.col(f"__df_{i}").alias("df"),
                        )
                        for i in range(len(terms))
                    ]
                )
            ).alias("__td"),
        )
        .select(
            id_col,
            "dl",
            "n_docs",
            "avgdl",
            F.col("__td.tf").alias("tf"),
            F.col("__td.df").alias("df"),
        )
        .filter(F.col("tf") > 0)
    )
    scored = melted
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    # (k1 + 1) as an IN-PLAN addition, not a Python-folded literal: the
    # driver-side fold could round differently than an engine evaluating
    # the same sum, and both sides of the oracle must see identical doubles
    contrib = idf * tf_d * (F.lit(k1) + F.lit(1.0)) / norm
    # micro-unit snap: per-term integers sum exactly in any order/engine
    contrib_u = F.floor(contrib * 1000000 + 0.5).cast("long")

    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        F.sum(contrib_u).cast("long").alias("__score_u"),
    )
    out = per_doc.select(
        id_col,
        "n_matched_terms",
        (F.col("__score_u").cast("double") / 1000000.0).alias("score"),
        "__score_u",
    )
    if top_k is not None:
        # orderBy + limit → TakeOrderedAndProject: distributed per-partition
        # top-k with a k-row driver merge, never a global single-task sort
        out = out.orderBy(
            F.col("__score_u").desc(), F.col(id_col).asc()
        ).limit(top_k)
    return out.drop("__score_u")


def phrase_match(
    docs: DataFrame,
    phrase: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval over the positional index: documents where
    the normalized token sequence contains the query tokens CONSECUTIVELY,
    with the occurrence count. Output ``(doc_id, n_occurrences)`` — the
    positional-postings query BM25's bag-of-words scoring cannot express
    (Lucene's PhraseQuery).

    Scale shape: the corpus explodes to positional postings ONCE, the
    term filter keeps only the phrase's terms (at 100 TB the per-term
    postings relation is |matching postings|, not |all postings| — the
    bm25_scores pruning rule), and each adjacency is ONE equi-join on
    ``(doc, position + offset)``: an m-token phrase is m−1 hash joins on
    progressively smaller relations (each join can only shrink the
    candidate set). Anchoring on the rarest term first is an index-time
    statistics optimization left to callers; join order here is left to
    Catalyst/AQE. No windows, no UDFs, no cartesians.
    """
    terms = (
        [t for t in (w.strip().lower() for w in phrase.split()) if t]
        if isinstance(phrase, str)
        else [str(t).lower() for t in phrase]
    )
    if not terms:
        raise ValueError("phrase_match: phrase must contain at least one token")
    post = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(norm_tokens(text_col)).alias("pos", "term"),
    ).filter(F.col("term").isin(terms))
    # the postings relation feeds ONE branch per phrase token — truncate
    # its lineage so an m-token phrase costs one tokenize pass, not m
    # (r10; it is query-term-sized after the filter, so the materialized
    # block is tiny). A single-token phrase has a single consumer, so
    # the truncation would be pure overhead — skip it (r11; the verdict
    # #8 A/B at m=2 read no-ckpt ~0.2 s faster at sf0.1 but the
    # truncation is what keeps an m-token phrase at ONE corpus tokenize
    # pass at scale, so it stays for m >= 2).
    if len(terms) > 1:
        post = post.localCheckpoint(eager=False)
    cur = post.filter(F.col("term") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, ["doc_id", "pos"])
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
    by: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of candidate lists:
    each list contributes ``1/(k + rank)`` per document and the fused
    score is the sum — the standard hybrid-search combiner (BM25 +
    embedding cosine) that needs NO score calibration between lists,
    only their ranks. Returns ``(by?, id_col, n_lists, rrf_score)``;
    ``k=60`` is the canonical damping constant. Ranks are dense
    row_numbers over ``(score desc, id asc)`` — fully deterministic —
    and per-rank contributions snap to integer micro-units before the
    SUM (order-free, oracle-exact).

    ``by`` partitions the ranking (per-query fusion); ``None`` ranks
    each list globally — correct ONLY because inputs are top-k candidate
    lists by contract (bounded), never raw corpora: a global row_number
    over an unbounded input would serialize one partition, and RRF over
    a full corpus is meaningless anyway (rank 10⁶ contributes ~0).

    Scale shape: one window per list (partitioned by ``by`` when per-
    query), a union, ONE aggregate keyed by (by?, id). With bounded
    lists every stage is candidate-sized, not corpus-sized.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    if k < 1:
        raise ValueError("rrf_fuse: k must be >= 1")
    keys = ([by] if by else []) + [id_col]
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    wspec = (
        Window.partitionBy(by).orderBy(*order)
        if by
        else Window.orderBy(*order)
    )
    parts = []
    for r in rankings:
        ranked = r.select(*keys, score_col).withColumn(
            "__rk", F.row_number().over(wspec)
        )
        parts.append(
            ranked.select(
                *keys,
                F.floor(
                    F.lit(1000000.0) / (F.lit(int(k)) + F.col("__rk")) + F.lit(0.5)
                )
                .cast("long")
                .alias("__c_u6"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return (
        allc.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum("__c_u6").cast("long").alias("__s_u6"),
        )
        .select(
            *keys,
            "n_lists",
            (F.col("__s_u6").cast("double") / 1000000.0).alias("rrf_score"),
        )
    )


def dirichlet_ql_scores(
    docs: DataFrame,
    query_terms: list[str],
    mu: int = 2000,
    top_k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (r9; Zhai &
    Lafferty 2001 — the language-model ranking family's standard
    member, BM25's principal rival and the default in anserini/Indri):
    ``score(q, d) = Σ_t ln((tf(t,d) + μ·p(t|C)) / (dl(d) + μ))`` with
    the collection model ``p(t|C) = cf(t)/|C|``.

    Candidates = documents containing ≥ 1 query term (the standard
    impact-ordered pruning; a no-term doc scores strictly below every
    candidate on the shared background mass). Scores INCLUDE the
    smoothing contribution of the candidate's missing terms, exactly as
    the formula demands. Query terms with zero collection frequency
    contribute ``ln 0 = −∞`` to every document equally, so they are
    dropped (ranking-preserving; documented rather than NaN).

    Engine-exactness (the lm.py discipline): each term's log argument
    clears to a ratio of exact integers —
    ``num = tf·|C| + μ·cf(t)``, ``den = (dl + μ)·|C|`` — accumulated in
    DECIMAL(38,0) (at a 100 TB corpus |C| ~ 1e14 tokens pushes tf·|C|
    past int64), and the per-term ``ln(num) − ln(den)`` of the
    correctly-rounded doubles snaps to integer micro-nats before the
    order-free per-doc sum. Output ``(doc_id, n_matched_terms, score)``
    with ``score`` the micro-nat sum in double; ``top_k`` ranks on the
    integer micro-nats (score desc, id asc).

    Scale shape: identical to :func:`bm25_scores` — one tokenize, the
    doc-length aggregate, a 1-row collection total broadcast, the
    term filter BEFORE every join, candidates × |query| scoring rows.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if mu < 1:
        raise ValueError("mu must be >= 1")
    terms = sorted({t.lower() for t in query_terms})
    dec = "decimal(38,0)"

    toks = docs.select(
        F.col(id_col), F.explode(norm_tokens(text_col)).alias("term")
    )
    # ONE pass, one doc-keyed conditional aggregate (r10, same rewrite as
    # bm25_scores): dl and every query term's tf come from a single
    # aggregation — the previous shape tokenized the corpus FOUR times
    # (dl, collection total, cf, tf) and re-joined the pieces by doc id.
    # Collection totals and per-term cf then reduce to ONE broadcast row
    # over that aggregate (cf(t) = Σ_docs tf(t,d), exact integers).
    per_doc_tf = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).cast("long").alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc_tf.agg(
        F.sum("dl").cast("long").alias("c_total"),
        *[
            F.sum(F.col(f"__tf_{i}")).cast("long").alias(f"__cf_{i}")
            for i in range(len(terms))
        ],
    )
    # candidates = docs containing >= 1 query term; each candidate emits
    # one row per POSITIVE-cf term (tf = 0 rows kept — the smoothing mass
    # of missing terms; zero-cf terms are the documented ranking-neutral
    # drop, and they occur in no document so candidacy is unaffected)
    any_tf = None
    for i in range(len(terms)):
        c = F.col(f"__tf_{i}") > 0
        any_tf = c if any_tf is None else (any_tf | c)
    pairs = (
        per_doc_tf.filter(any_tf)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "dl",
            "c_total",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"__tf_{i}").alias("tf"),
                            F.col(f"__cf_{i}").alias("cf"),
                        )
                        for i in range(len(terms))
                    ]
                )
            ).alias("__tc"),
        )
        .filter(F.col("__tc.cf") > 0)
        .select(
            id_col,
            F.col("__tc.tf").alias("tf"),
            F.expr(
                f"cast(__tc.tf as {dec}) * cast(c_total as {dec})"
                f" + {int(mu)} * cast(__tc.cf as {dec})"
            ).alias("__num"),
            F.expr(
                f"(cast(dl as {dec}) + {int(mu)}) * cast(c_total as {dec})"
            ).alias("__den"),
        )
    )
    u6 = F.floor(
        (F.log(F.col("__num").cast("double")) - F.log(F.col("__den").cast("double")))
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    scored = pairs.groupBy(id_col).agg(
        F.sum((F.col("tf") > 0).cast("long")).cast("long").alias("n_matched_terms"),
        F.sum(u6).cast("long").alias("__u6"),
    )
    out = scored.select(
        id_col,
        "n_matched_terms",
        (F.col("__u6").cast("double") / 1000000.0).alias("score"),
    )
    if top_k is not None:
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        out = out.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") <= top_k
        ).drop("__rk")
    return out
