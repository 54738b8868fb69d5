"""Training-data selection operators: greedy coverage-maximizing subset
selection and temperature-scaled domain mixing.

Two standard curation moves when composing an LLM training mix:

* **Greedy max-coverage selection** — pick the ``k`` documents that
  together cover the most distinct vocabulary (the classic submodular
  facility-location/max-coverage greedy, 1-1/e optimal): the
  diverse-subset selector for dedup-adjacent curation and eval-set
  construction.
* **Temperature-scaled mixing weights** — per-domain sampling weights
  ``w_d ∝ n_d^α`` (α = 1 proportional, α = 0 uniform, in between the
  multilingual/multi-domain "temperature" rebalance of mT5/XLM-R): the
  document-count rebalance that upweights small domains without
  swamping large ones.

Both follow the repo's engine-portable integer disciplines so DuckDB
oracles hash-match: micro-unit floors, basis-point rounding via the
``(2N+D) div 2D`` integer recipe, (value desc, id asc) tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = [
    "greedy_coverage_select",
    "temperature_mix_weights",
    "dsir_score",
    "token_budget_fill",
    "mmr_select",
]


def doc_word_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The ONE corpus pass for coverage selection: distinct
    ``(doc_id, word)`` membership over normalized tokens. Distinctness
    is PER DOCUMENT, so it is ``array_distinct`` on the token array
    before the explode — a row-local operation, zero shuffle (a naive
    ``.distinct()`` after the explode shuffles the whole exploded
    relation: measured 100 s vs ~8 s for the build at 41M rows)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(norm_tokens(text_col))).alias("word"),
    )


def greedy_coverage_select(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_gain: int = 1,
) -> list[tuple[int, int]]:
    """Greedily select up to ``k`` documents maximizing marginal distinct-
    word coverage. Returns ``[(doc_id, gain), ...]`` in selection order,
    where ``gain`` is the number of NEW words that document contributed.

    The greedy algorithm is inherently iterative (each pick reshapes every
    remaining document's marginal gain), so this is a DRIVER LOOP — but
    over the right relation: the corpus is tokenized ONCE into the cached
    distinct ``(doc_id, word)`` membership table; each round is one
    anti-join against the covered-word set (Zipf-small — broadcast),
    one count aggregate, and a 1-row argmax collect (the sanctioned
    bounded driver hop). Ties break (gain desc, doc_id asc) so selection
    is fully deterministic and SQL-unrollable for fixed ``k``.

    Stops early when the best remaining gain falls below ``min_gain``
    (picking zero-gain documents is noise, not coverage).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # the word string never reaches the output — only counts do — so
    # collapse it to a 64-bit hash (the ngram_jaccard lesson: smaller
    # cached relation, cheaper anti-join probes; collision odds
    # ~|vocab|²/2⁶⁴, immaterial to a coverage argmax)
    dw = (
        doc_word_table(docs, text_col, id_col)
        .select("doc_id", F.xxhash64("word").alias("word"))
        .persist()
    )
    # no up-front count(): the lazy persist materializes as a side
    # effect of round 0's argmax — one fewer pass over the tokenize
    picks: list[tuple[int, int]] = []
    try:
        for _ in range(k):
            if picks:
                # the covered set IS the picked docs' words, so ONE isin
                # filter over the cached relation rebuilds it each round
                # — constant-depth plan (r10; the former form grew a
                # union+distinct chain of per-doc filters and paid a
                # localCheckpoint planning pass per round to truncate it)
                covered = dw.filter(
                    F.col("doc_id").isin([d for d, _ in picks])
                ).select("word")
                remaining = dw.join(F.broadcast(covered), "word", "left_anti")
            else:
                remaining = dw
            top = (
                remaining.groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
                .orderBy(F.col("gain").desc(), F.col("doc_id").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["gain"] < min_gain:
                break
            picks.append((top[0]["doc_id"], int(top[0]["gain"])))
    finally:
        dw.unpersist()
    return picks


def temperature_mix_weights(
    docs: DataFrame,
    domain_col: str = "source",
    alpha_pct: int = 50,
) -> DataFrame:
    """Per-domain temperature-scaled sampling weights:
    ``w_d ∝ n_d^(alpha_pct/100)``, output
    ``(domain, n_docs, weight_u, share_bp)`` where ``weight_u`` is the
    unnormalized weight in integer micro-units and ``share_bp`` the
    normalized share in basis points.

    Engine-portable determinism: ``n^0.5`` is ``sqrt`` — IEEE requires
    sqrt to be CORRECTLY rounded, so every engine produces the identical
    double; the micro-unit floor then snaps it integral, and the share
    is pure integer arithmetic (round-half-up ``(2N+D) div 2D``, the
    association_rules recipe). For ``alpha_pct`` other than 0/50/100 the
    ``pow`` is snapped the same way but correct rounding of ``pow`` is
    not IEEE-mandated — the floor snap makes a cross-engine mismatch
    vanishingly unlikely, not impossible.

    Scale shape: one domain-keyed aggregate (map-side partials absorb
    any domain skew) over |domains| rows, then the total as an empty-
    frame window over that |domains|-row relation — a single-partition
    hop over a handful of rows, so the corpus is scanned ONCE and never
    joined or reshuffled (a broadcast-total join would plan the count
    subtree twice).
    """
    if not 0 <= alpha_pct <= 100:
        raise ValueError("alpha_pct must be in [0, 100]")
    counts = (
        docs.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    if alpha_pct == 50:
        scaled = F.sqrt(F.col("n_docs").cast("double"))
    elif alpha_pct == 100:
        scaled = F.col("n_docs").cast("double")
    elif alpha_pct == 0:
        scaled = F.lit(1.0)
    else:
        scaled = F.pow(F.col("n_docs").cast("double"), F.lit(alpha_pct / 100.0))
    w = counts.withColumn(
        "weight_u", F.floor(scaled * 1000000 + F.lit(0.5)).cast("long")
    )
    return w.select(
        "domain",
        "n_docs",
        "weight_u",
        F.expr(
            "(2 * weight_u * 10000 + sum(weight_u) OVER ()) "
            "div (2 * sum(weight_u) OVER ())"
        )
        .cast("long")
        .alias("share_bp"),
    )


def dsir_score(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: int = 1,
    k: int = 50,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    rank the raw pool by how much its hashed-unigram distribution looks
    like the ``target`` domain. Per-bucket importance weight
    ``w[b] = ln p_target(b) - ln p_raw(b)`` under add-``alpha`` smoothed
    bag models over ``n_buckets`` md5 hash buckets; a document's score is
    the count-weighted sum of its buckets' weights (its log importance
    ratio). Returns the top ``k`` NON-target documents —
    ``(doc_id, n_feat_tokens, dsir_score_u)`` with the score in integer
    micro-nats, ordered (score desc, doc_id asc).

    Engine-exact: every ``ln`` argument is an integer count, and each of
    the four log terms is snapped to micro-nats independently
    (``floor(ln(n)·1e6 + 0.5)``) before any addition, so per-bucket
    weights and per-doc sums are pure integer arithmetic — the same
    contract as ``text.char_entropy``. Documents with zero normalized
    tokens emit no row.

    Scale shape: the corpus is tokenized and exploded ONCE, collapsed
    immediately to the per-doc bucket-count relation (bounded by
    |docs|·n_buckets, in practice ~tokens/doc distinct buckets per doc);
    the bucket-weight model is a second aggregate over THAT relation —
    never a second corpus scan — and is at most ``n_buckets`` rows, so
    it broadcast-joins back. ``localCheckpoint(eager=False)`` truncates
    the doc-count lineage so Catalyst does not replicate the corpus scan
    into both the model branch and the scoring branch.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from ..functions.hashing import md5_long60
    from .text import norm_tokens

    is_t = target if not isinstance(target, str) else F.expr(target)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        is_t.alias("__is_t"),
        F.explode(norm_tokens(text_col)).alias("__w"),
    )
    doc_counts = (
        toks.groupBy(
            "doc_id", "__is_t", (md5_long60(F.col("__w")) % n_buckets).alias("__b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint(eager=False)
    )

    def _lnu(c):
        return F.floor(F.log(c.cast("double")) * 1000000 + F.lit(0.5)).cast("long")

    model = doc_counts.groupBy("__b").agg(
        F.sum(F.when(F.col("__is_t"), F.col("__c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__ct"),
        F.sum("__c").cast("long").alias("__cr"),
    )
    weights = model.select(
        "__b",
        (
            _lnu(F.col("__ct") + alpha)
            - _lnu(F.expr("sum(__ct) OVER ()") + alpha * n_buckets)
            - _lnu(F.col("__cr") + alpha)
            + _lnu(F.expr("sum(__cr) OVER ()") + alpha * n_buckets)
        ).alias("__w_u"),
    )
    scored = (
        doc_counts.filter(~F.col("__is_t"))
        .join(F.broadcast(weights), "__b")
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("n_feat_tokens"),
            F.sum(F.col("__c") * F.col("__w_u")).cast("long").alias("dsir_score_u"),
        )
    )
    return scored.orderBy(F.desc("dsir_score_u"), F.asc("doc_id")).limit(k)


def token_budget_fill(
    docs: DataFrame,
    token_budget: int,
    alpha_pct: int = 50,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Fill a total token budget across domains: temperature-scaled
    per-domain quotas (``quota_d ∝ avail_d^(alpha_pct/100)``, clamped at
    what the domain has), then a deterministic hash-ordered greedy fill
    inside each domain until its quota is reached — the step that turns
    a mixture policy into an actual training-set manifest. Returns the
    KEPT docs ``(domain, doc_id, n_tokens, cum_tokens, quota_tokens)``.

    Determinism contract: availability weights snap to integer
    micro-units (``sqrt`` is IEEE-correctly-rounded, so alpha 50 is
    bit-exact everywhere; other alphas inherit the pow caveat of
    ``temperature_mix_weights``); the quota is
    ``floor(budget · (weight_u / tot_u) + 0.5)`` with the DIVISION
    FIRST — the ratio ≤ 1 keeps the product inside double's exact-integer
    range for any budget < 2^53 tokens, where ``budget · weight_u``
    would overflow it at corpus scale. Fill order is the md5 sample
    bucket with doc-id tie-break (a total order), so the manifest is
    reproducible bit-for-bit and re-running with a bigger budget only
    APPENDS docs (the fill prefix is stable — what makes incremental
    budget raises cheap). Token counts are whitespace tokens, the
    ``sequence_packing`` convention.

    Scale shape: the narrow (doc, domain, tokens) projection is scanned
    twice — once for the |domains|-row availability aggregate, once for
    the fill window — which at 100 TB beats materializing a corpus-sized
    checkpoint (the projection is scan-bound, carries no shuffle, and
    the two consumers' exchanges are both keyed by domain). Quotas come
    back as a broadcast |domains|-row join; domain skew in the fill
    window is bounded by the running frame, not island fan-out.
    """
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    if not 0 <= alpha_pct <= 100:
        raise ValueError("alpha_pct must be in [0, 100]")
    from .sampling import sample_bucket_expr

    text = F.col(text_col)
    n_tokens = (
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(text), r"\s+")))
        .cast("long")
    )
    toks = docs.filter(F.col(domain_col).isNotNull()).select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
    )
    avail = toks.groupBy("domain").agg(
        F.sum("n_tokens").cast("long").alias("avail_tokens")
    )
    if alpha_pct == 50:
        scaled = F.sqrt(F.col("avail_tokens").cast("double"))
    elif alpha_pct == 100:
        scaled = F.col("avail_tokens").cast("double")
    elif alpha_pct == 0:
        scaled = F.lit(1.0)
    else:
        scaled = F.pow(F.col("avail_tokens").cast("double"), F.lit(alpha_pct / 100.0))
    w = avail.withColumn(
        "__w_u", F.floor(scaled * 1000000 + F.lit(0.5)).cast("long")
    )
    quotas = w.select(
        "domain",
        F.least(
            F.col("avail_tokens"),
            F.floor(
                F.lit(float(token_budget))
                * (
                    F.col("__w_u").cast("double")
                    / F.expr("sum(__w_u) OVER ()").cast("double")
                )
                + F.lit(0.5)
            ).cast("long"),
        ).alias("quota_tokens"),
    )
    order = [sample_bucket_expr(F.col("doc_id"), seed).asc(), F.col("doc_id").asc()]
    cum = F.sum("n_tokens").over(
        Window.partitionBy("domain").orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        toks.join(F.broadcast(quotas), "domain")
        .withColumn("cum_tokens", cum.cast("long"))
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select("domain", "doc_id", "n_tokens", "cum_tokens", "quota_tokens")
    )


def mmr_select(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    pool: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k re-rank (Carbonell &
    Goldstein 1998): per query, greedily pick the candidate maximizing
    ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — the standard
    diversity re-rank for retrieval results and for sampling varied
    exemplars from a clustered corpus (plain top-k returns k near-copies
    of the best hit; MMR returns the best hit plus its complements).

    Integer-exact greedy: λ is the RATIONAL ``lam_num/lam_den``,
    relevance and pairwise similarities snap to micro-units, so every
    round's argmax compares pure integers (``lam_num·rel_u −
    (lam_den−lam_num)·maxsim_u``) with the id tie-break — no float
    accumulation across rounds, and the DuckDB oracle unrolls the same
    rounds verbatim.

    Plan shape: ONE corpus-wide pass builds the top-``pool`` relevance
    candidates per query (broadcast queries, the brute_force_topk plan;
    at index scale swap in the IVF candidate generator — the greedy is
    agnostic to where candidates came from). Every greedy round then
    touches only |queries|·pool candidate rows joined against the
    ≤ |queries|·round selected rows — broadcast-sized work per round,
    with the candidate relation lineage-truncated ONCE for all rounds
    and the selected relation truncated per round (the
    greedy_coverage_select discipline).

    Returns ``(query_id, rank, neighbor_id, rel, mmr_score)`` with
    ``rank`` 1-based; ``mmr_score`` is NULL for rank 1 (the seed pick is
    pure argmax-relevance — the textbook initialization)."""
    from .similarity import cosine

    if k < 1 or pool < k:
        raise ValueError("mmr_select: need k >= 1 and pool >= k")
    if not (0 < lam_num <= lam_den):
        raise ValueError("mmr_select: need 0 < lam_num <= lam_den")
    unit = 1_000_000

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    rel_u = F.floor(cosine(F.col("__qv"), F.col("__cv")) * unit + 0.5).cast("long")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", rel_u.alias("rel_u"), "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel_u").desc(), F.col("cand_id").asc()
    )
    cand = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= pool)
        .drop("__rk")
        .localCheckpoint(eager=False)  # feeds every greedy round
    )

    picks = (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    ).select(
        "query_id",
        F.lit(1).alias("rank"),
        "cand_id",
        "rel_u",
        F.lit(None).cast("long").alias("score_u"),
        "__cv",
    )
    selected = picks.select("query_id", "cand_id", "__cv").localCheckpoint(
        eager=False
    )
    out = [picks.drop("__cv")]

    sim_u = F.floor(cosine(F.col("__cv"), F.col("__sv")) * unit + 0.5).cast("long")
    for rnd in range(2, k + 1):
        remaining = cand.join(
            selected.select("query_id", "cand_id"), ["query_id", "cand_id"], "anti"
        )
        pairs = remaining.join(
            F.broadcast(
                selected.select(
                    "query_id", F.col("__cv").alias("__sv")
                )
            ),
            "query_id",
        )
        maxsim = pairs.groupBy("query_id", "cand_id").agg(
            F.max("rel_u").alias("rel_u"),
            F.max(sim_u).alias("maxsim_u"),
            F.first("__cv").alias("__cv"),
        )
        score = (
            F.lit(lam_num) * F.col("rel_u")
            - F.lit(lam_den - lam_num) * F.col("maxsim_u")
        ).cast("long")
        w_s = Window.partitionBy("query_id").orderBy(
            F.col("score_u").desc(), F.col("cand_id").asc()
        )
        pick = (
            maxsim.withColumn("score_u", score)
            .withColumn("__rk", F.row_number().over(w_s))
            .filter(F.col("__rk") == 1)
            .select(
                "query_id",
                F.lit(rnd).alias("rank"),
                "cand_id",
                "rel_u",
                "score_u",
                "__cv",
            )
        )
        selected = (
            selected.unionByName(pick.select("query_id", "cand_id", "__cv"))
            .localCheckpoint(eager=False)
        )
        out.append(pick.drop("__cv"))

    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("cand_id").alias("neighbor_id"),
        (F.col("rel_u").cast("double") / unit).alias("rel"),
        (F.col("score_u").cast("double") / lam_den / unit).alias("mmr_score"),
    )
