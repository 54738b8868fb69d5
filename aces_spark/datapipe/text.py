"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Column expressions (JVM-side, whole-stage codegen —
no Python UDFs in the hot path) over a ``documents`` table
``(doc_id, text, ...)``. Each has an exact ANSI-SQL equivalent so results
can be verified against a DuckDB oracle.

Determinism notes: every ratio is rounded explicitly so Spark and any SQL
oracle hash identically; fingerprints use md5 (identical hex output across
engines).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# small built-in stopword seeds for the n-gram language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
}


# The ONE tokenizer contract: lowercase, any non-[a-z0-9] run → space,
# split on spaces, drop empties. norm_tokens is the Spark Column form;
# norm_tokens_py is the pure-Python twin for driver-side inputs
# (blocklist phrases, CLI args). Change them TOGETHER —
# tests/test_advice_r10.py pins their agreement on representative
# strings so phrase and document tokenization can never diverge
# silently (r9 advisor finding).
NORM_TOKEN_PATTERN = r"[^a-z0-9]+"


def norm_tokens(text_col: str | Column) -> Column:
    """Lowercased alphanumeric word tokens (engine-portable normalization —
    the one tokenizer shared by shingling, vocab stats, decontamination,
    and the blocklist gate so every module agrees on what a "word" is)."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    normalized = F.trim(F.regexp_replace(F.lower(text), NORM_TOKEN_PATTERN, " "))
    return F.when(F.length(normalized) == 0, F.array().cast("array<string>")).otherwise(
        F.split(normalized, " ")
    )


def norm_tokens_py(text: str) -> list[str]:
    """Pure-Python twin of :func:`norm_tokens` for driver-known strings
    (blocklist phrases). Same contract, same pattern constant."""
    import re

    return [t for t in re.sub(NORM_TOKEN_PATTERN, " ", text.lower()).split() if t]


def vocab_top_k(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary statistics: the ``k`` most frequent normalized
    words with their document frequencies. Output
    ``(word, n_occurrences, n_docs)``, ordered by count desc then word asc
    (fully deterministic).

    Scale shape: explode → hash-aggregate with map-side partial combine
    (word keys, Zipf-skewed but partial agg absorbs the head), then the
    global top-k is a ``TakeOrderedAndProject`` — no full sort of the
    vocabulary."""
    words = df.select("doc_id", F.explode(norm_tokens(text_col)).alias("word"))
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.col("n_occurrences").desc(), F.col("word").asc()).limit(k)


def group_vocab_top_k(
    df: DataFrame,
    group_col: str = "lang",
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocabulary: the ``k`` most frequent normalized words
    WITHIN each group (language, source, split, ...). Output
    ``(group, word, n_occurrences, rank)``, deterministic (count desc,
    word asc ties).

    Scale shape: the word aggregate partial-combines map-side like
    :func:`vocab_top_k`; the per-group top-k is a rank window partitioned
    by group over the aggregated (group, word) relation — a relation the
    size of the group-sharded vocabulary, not the corpus, and each group's
    vocabulary is orders of magnitude smaller than the token stream."""
    words = df.select(F.col(group_col).alias("group"), F.explode(norm_tokens(text_col)).alias("word"))
    counts = words.groupBy("group", "word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = Window.partitionBy("group").orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("group", "word", F.col("n_occurrences").cast("long").alias("n_occurrences"),
                F.col("rank").cast("long").alias("rank"))
    )


def vocab_richness(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary-richness estimators (r10) — the coverage
    question every tokenizer/data-mix decision hinges on: how much of
    the language's vocabulary has this corpus actually seen?

    One row: ``(n_tokens, v_observed, f1, f2, chao1, gt_unseen)`` —

    * ``f1``/``f2``: hapax and dis legomena counts (words seen exactly
      once / twice) from the frequency-of-frequencies profile.
    * ``chao1``: the bias-corrected Chao1 richness floor
      ``V + f1·(f1−1) / (2·(f2+1))`` — a lower bound on the TRUE
      vocabulary size the corpus samples from (Chao 1984).
    * ``gt_unseen``: the Good–Turing missing-mass estimate ``f1 / N`` —
      the probability the next token is a word never seen in this
      corpus (Gale & Sampson 1995). High missing mass = the corpus is
      far from vocabulary saturation for its domain.

    Both derived estimators floor-round to 6 dp (the repo's
    order-independent rounding rule). Scale shape: one token explode →
    hash-aggregate per word (map-side partial combine absorbs the Zipf
    head) → a count-of-counts aggregate over the vocabulary-sized
    relation → one final 1-row fold. Linear, two exchanges, no joins.
    """
    words = df.select(F.explode(norm_tokens(text_col)).alias("word"))
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    r6 = lambda col: F.floor(col * 1000000 + 0.5) / 1000000.0  # noqa: E731
    agg = freqs.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_observed"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    return agg.select(
        "n_tokens",
        "v_observed",
        "f1",
        "f2",
        r6(
            F.col("v_observed").cast("double")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1).cast("double")
            / (2.0 * (F.col("f2") + 1).cast("double"))
        ).alias("chao1"),
        r6(F.col("f1").cast("double") / F.col("n_tokens").cast("double")).alias(
            "gt_unseen"
        ),
    )


def token_histogram(
    df: DataFrame, bucket_width: int = 50, text_col: str = "text"
) -> DataFrame:
    """Token-length distribution: documents bucketed by BPE-ish token
    count into fixed-width bins. Output
    ``(bucket_start, n_docs, total_tokens)`` where ``bucket_start`` is the
    bin's inclusive lower edge (``(tokens // width) * width`` — integer
    math, engine-exact).

    The length histogram is the first thing a curation run looks at
    (truncation pressure vs packing efficiency at a given context
    length). One hash aggregate over at most ``max_len/width`` keys;
    the per-doc token count is row-local."""
    toks = bpe_ish_token_count(F.col(text_col))
    bucket = ((toks / bucket_width).cast("long") * bucket_width).alias("bucket_start")
    return df.select(bucket, toks.alias("__t")).groupBy("bucket_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("total_tokens"),
    )


def corpus_mix(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Training-mix composition report: per group (source × language by
    default) document count, total BPE-ish tokens, and the group's share
    of corpus tokens in exact basis points — the table a data-mixing
    decision reads. Token totals are integer-exact; the share divides two
    exact integers, so it is deterministic across engines. One hash
    aggregate (low-cardinality keys, map-side partials) + a window over
    the tiny aggregated relation."""
    toks = bpe_ish_token_count(F.col(text_col))
    agg = df.select(*group_cols, toks.alias("__t")).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("total_tokens"),
    )
    total = F.sum("total_tokens").over(Window.partitionBy())
    share_bp = F.floor(F.col("total_tokens") / total * 10000 + 0.5)
    return agg.select(*group_cols, "n_docs", "total_tokens", (share_bp / 10000).alias("token_share"))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored token estimate: count of word/number/punctuation
    chunks (regex ``\\w+|[^\\w\\s]``), the classic pre-tokenizer split.

    Evaluated as TWO simple counts — maximal ``\\w+`` runs plus single
    ``[^\\w\\s]`` chars — which is exactly the alternation's match count
    (the branches match disjoint character classes, so no overlap) but
    avoids the per-character alternation backtracking that made the
    single-regex form the most expensive row-local expression in the repo
    (round-2 bench: 5.7× regression on ``token_counts``).
    """
    return (
        F.regexp_count(text, F.lit(r"\w+")) + F.regexp_count(text, F.lit(r"[^\w\s]"))
    ).cast("long")


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character statistics and quality ratios."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_space = F.length(F.regexp_replace(text, r"[^ \t\n]", ""))
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        token_count(text).alias("n_tokens"),
        F.round(n_alpha / safe, 4).alias("alpha_ratio"),
        F.round(n_digit / safe, 4).alias("digit_ratio"),
        F.round(n_punct / safe, 4).alias("punct_ratio"),
        F.round(n_space / safe, 4).alias("space_ratio"),
    )


def quality_expr(text: Column) -> Column:
    """The heuristic quality score in [0, 1] as a reusable expression:
    length band + alpha ratio + mean-word-length band (the usual
    C4/Gopher-style gates), at 4 dp.

    Computed in integer basis points with ``floor(x + 0.5)`` rather than
    ``round(x, 4)``: ``round`` half-boundary handling differs across
    engines (found at sf0.1 — 0.55125 rounded to 0.5513 by Spark, 0.5512
    by DuckDB), while ``floor`` on an IEEE double is exact and identical
    everywhere, so every SQL oracle reproduces the score bit-for-bit at
    any scale."""
    n_chars = F.length(text).cast("double")
    n_tokens = token_count(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    word_len_ok = (mean_word_len >= 3) & (mean_word_len <= 12)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    bp = (
        F.when(len_ok, F.lit(4000)).otherwise(F.lit(0))
        + F.when(word_len_ok, F.lit(3000)).otherwise(F.lit(0))
        + F.floor(alpha_ratio * 3000 + 0.5).cast("long")
    )
    return bp.cast("double") / 10000.0


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics + the composite score
    (:func:`quality_expr`)."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    n_tokens = token_count(text).cast("double")
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        quality_expr(text).alias("quality"),
    )


def lang_hit_exprs(text: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts as reusable expressions."""
    lower = F.lower(text)
    hit_cols = {}
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        hit_cols[f"{lang}_hits"] = F.regexp_count(lower, F.lit(pattern)).cast("long")
    return hit_cols


def lang_pred_expr(text: Column) -> Column:
    """Argmax language prediction (ties broken by fixed order
    en > de > fr > es) as a reusable expression."""
    hit_cols = lang_hit_exprs(text)
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_hits = hit_cols[f"{langs[0]}_hits"]
    for lang in langs[1:]:
        cond = hit_cols[f"{lang}_hits"] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hit_cols[f"{lang}_hits"]).otherwise(best_hits)
    return best


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-marker language heuristic: count word-boundary hits
    of per-language marker words; predict the argmax."""
    text = F.col(text_col)
    hit_cols = lang_hit_exprs(text)
    return df.select(
        "doc_id",
        *[c.alias(name) for name, c in hit_cols.items()],
        lang_pred_expr(text).alias("lang_pred"),
    )


def strip_html_expr(text: Column) -> Column:
    """Plain text from HTML markup: drop script/style blocks wholesale,
    strip tags, decode-ish entities to spaces, collapse whitespace. The
    web-corpus extraction step, as a pure Column expression (row-local, in
    whole-stage codegen — no parser library in the hot path; for
    DOM-accurate extraction plug a Pandas-UDF stage instead).

    Regex subset chosen to behave identically under Java regex and RE2
    (no backreferences, lazy quantifiers + inline (?is) flags only) so SQL
    oracles reproduce it."""
    no_script = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?is)<style[^>]*>.*?</style>", " ")
    no_comment = F.regexp_replace(no_style, r"(?s)<!--.*?-->", " ")
    no_tags = F.regexp_replace(no_comment, r"<[^>]+>", " ")
    no_entities = F.regexp_replace(no_tags, r"&[a-zA-Z]{2,8};|&#[0-9]{1,6};", " ")
    return F.trim(F.regexp_replace(no_entities, r"\s+", " "))


def strip_html(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document HTML→text extraction (:func:`strip_html_expr`):
    ``(doc_id, clean_text, n_chars_clean)``."""
    clean = strip_html_expr(F.col(text_col))
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    )


def fingerprint_expr(text: Column) -> Column:
    """md5 of the lowercased/whitespace-normalized alphanumeric text."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return F.md5(F.encode(normalized, "UTF-8"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint (:func:`fingerprint_expr`).
    Identical text modulo case/punctuation/whitespace ⇒ identical
    fingerprint."""
    return df.select("doc_id", fingerprint_expr(F.col(text_col)).alias("fingerprint"))


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Composite pretraining-corpus cleaning filter — the shape a
    production data pipeline actually runs: quality gate ∧ language filter
    ∧ exact-dedup canonical selection, composed as ONE pass.

    Plan shape (the point of the composition): quality, language, and
    fingerprint are all computed in a single narrow projection over one
    scan — no self-joins — the cheap row-local gates filter FIRST, and
    only survivors pay the fingerprint-keyed exchange where
    ``min(doc_id) over (partition by fingerprint)`` keeps one canonical
    copy per content group. Returns
    ``(doc_id, quality, lang_pred, fingerprint)`` for surviving docs.
    """
    text = F.col(text_col)
    scored = df.select(
        "doc_id",
        quality_expr(text).alias("quality"),
        lang_pred_expr(text).alias("lang_pred"),
        fingerprint_expr(text).alias("fingerprint"),
    )
    kept = scored.filter((F.col("quality") >= min_quality) & (F.col("lang_pred") == lang))
    w = Window.partitionBy("fingerprint")
    return (
        kept.withColumn("__canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__canon"))
        .drop("__canon")
    )


def quantile_bounds(
    df: DataFrame,
    value_col: str = "n_chars",
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """One-row frame with the corpus ``[lo, hi]`` quantile bounds of
    ``value_col`` (4 dp, floor-rule exact) — the trim thresholds for
    winsorizing/outlier removal. Exact ``percentile`` with map-side
    partials; swap ``percentile_approx`` at 100 TB if exactness is not
    required (same call shape)."""
    q = F.expr(f"percentile(`{value_col}`, array({lo!r}, {hi!r}))")
    def _r(c):
        return F.floor(c * 10000 + 0.5).cast("double") / 10000.0
    return df.agg(
        _r(q[0]).alias("lo_bound"), _r(q[1]).alias("hi_bound")
    )


def outlier_filter(
    df: DataFrame,
    value_col: str = "n_chars",
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the corpus ``[lo, hi]``
    quantile band (inclusive) — the distribution-trimming pass that drops
    pathological outliers (truncated or runaway documents) before
    training. Adds ``lo_bound`` / ``hi_bound`` for audit.

    Plan: the 1-row bounds frame broadcast-joins onto the scan (Catalyst
    plans BroadcastNestedLoopJoin over a single row — effectively free)
    and the band test is a row-local filter; the corpus is scanned twice
    (once for the percentile, once filtered), the standard two-pass
    trim — cache the input when it fits, or precompute bounds on a
    sample."""
    bounds = quantile_bounds(df, value_col, lo, hi)
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(bounds))
        .filter((v >= F.col("lo_bound")) & (v <= F.col("hi_bound")))
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document Shannon character entropy in exact integer
    micro-nats — the low-entropy/compression-ratio quality signal
    (Gopher/RedPajama-class rules drop documents whose character
    distribution is too predictable: boilerplate, repeated padding,
    base64 blobs sit at the entropy extremes).

    ``H = ln(n) - (1/n)·Σ c_i·ln(c_i)`` over per-character counts —
    algebraically equal to ``-Σ p·ln p`` but each term depends only on
    integer counts, so every per-character term snaps to micro-nats
    (``floor(c·ln(c)·1e6 + 0.5)``) BEFORE the per-doc sum: the sum is
    integer-exact, order-independent, engine-exact (same contract as
    datapipe.lm). Empty/null documents emit NO row (they have no
    characters to explode) — left-join the output back onto the corpus
    if every id must appear.

    Plan: posexplode to characters → one (doc, char) count aggregate →
    one doc aggregate. Both aggregates are keyed by doc (uniform), with
    map-side partials; no joins, no windows.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("__ch"),
    ).filter(F.col("__ch") != "")
    counts = chars.groupBy(id_col, "__ch").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    term_u = F.floor(
        F.col("__c").cast("double") * F.log(F.col("__c").cast("double")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_chars"),
        F.sum(term_u).cast("long").alias("__s_u"),
    )
    h = F.log(F.col("n_chars").cast("double")) - (
        F.col("__s_u").cast("double") / F.col("n_chars") / 1000000.0
    )
    ent = F.when(F.col("n_chars") > 0, h).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        "n_chars",
        (F.floor(ent * 1000000 + F.lit(0.5)).cast("double") / 1000000.0).alias(
            "entropy_nats"
        ),
    )


def distinctive_terms(
    df: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-domain distinctive vocabulary: for each domain, the ``k``
    words whose smoothed log-odds most favor that domain over the REST
    of the corpus — the Monroe et al. (2008) "fightin' words" analysis
    in its engine-portable form. Output ``(domain, word, n_domain,
    delta_u)``, ``delta_u`` the add-1-smoothed log-frequency-ratio
    ``ln((c+1)/(T_d+1)) − ln((r+1)/(T_r+1))`` in integer micro-nats
    (every ``ln`` argument is an integer count and each term snaps
    independently — the char_entropy contract; the full Monroe
    variance normalization is monotone per word and omitted), ordered
    (delta desc, word asc) per domain.

    Scale shape: ONE corpus tokenize → one (domain, word) count
    aggregate, then everything else is window functions OVER THAT
    |domains|·|vocab|-bounded relation (domain totals, global word
    counts, the corpus total, and the per-domain top-k rank) — the
    corpus is scanned once and never joined.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(norm_tokens(text_col)).alias("word"),
    ).filter(F.col("domain").isNotNull())
    c = toks.groupBy("domain", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n_domain")
    )

    def _lnu(x):
        return F.floor(F.log(x.cast("double")) * 1000000 + F.lit(0.5)).cast("long")

    t_d = F.expr("sum(n_domain) OVER (PARTITION BY domain)")
    g_w = F.expr("sum(n_domain) OVER (PARTITION BY word)")
    t_all = F.expr("sum(n_domain) OVER ()")
    scored = c.select(
        "domain",
        "word",
        "n_domain",
        (
            _lnu(F.col("n_domain") + 1)
            - _lnu(t_d + 1)
            - _lnu(g_w - F.col("n_domain") + 1)
            + _lnu(t_all - t_d + 1)
        ).alias("delta_u"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("delta_u"), F.asc("word")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sentence_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document sentence segmentation + readability signals:
    ``(id, n_sentences, n_words, words_per_sentence, syllables_per_word,
    reading_ease)`` — the classic Flesch-family quality features a text
    curation pipeline buckets on (very long sentences and very dense
    words both predict low-quality extraction; machine-generated spam
    often shows impossibly uniform values).

    Heuristics are deliberately engine-portable: sentences are non-blank
    segments between ``[.!?]`` runs; words are whitespace tokens
    (:func:`token_count`); syllables are vowel-group runs
    (``[aeiouy]+``) — the standard cheap proxy. Reading ease is
    ``206.835 − 1.015·(words/sentence) − 84.6·(syllables/word)`` at 3 dp
    (NULL when there are no sentences or no words; exact integer inputs
    + one identical expression tree ⇒ engine-exact). All row-local
    Column expressions: map-only, zero shuffle at any corpus size."""
    t = F.col(text_col)
    sents = F.size(
        F.filter(
            F.split(t, r"[.!?]+"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    ).cast("long")
    words = token_count(t)
    syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    wps = F.when(
        (F.col("n_sentences") > 0),
        F.col("n_words").cast("double") / F.col("n_sentences").cast("double"),
    )
    spw = F.when(
        (F.col("n_words") > 0),
        F.col("n_syllables").cast("double") / F.col("n_words").cast("double"),
    )
    ease = 206.835 - 1.015 * F.col("words_per_sentence") - 84.6 * F.col(
        "syllables_per_word"
    )
    return (
        df.select(
            F.col(id_col),
            sents.alias("n_sentences"),
            words.alias("n_words"),
            syll.alias("n_syllables"),
        )
        .withColumn("words_per_sentence", F.round(wps, 4))
        .withColumn("syllables_per_word", F.round(spw, 4))
        .withColumn("reading_ease", F.round(ease, 3))
    )


def tokenizer_fertility(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group tokenizer-fertility report: BPE-ish tokens per
    whitespace word and characters per BPE-ish token — the standard
    tokenizer-efficiency diagnostic for a multilingual mix (a language
    whose fertility is 2× the corpus mean pays 2× the compute per word;
    chars/token collapsing toward 1 flags byte-fallback-style
    fragmentation).

    Exact integer sums (counts are longs; no float accumulates across
    rows), one group-keyed aggregate with map-side partials, then two
    divisions at 4 dp — NULL when the denominator is zero. Output:
    ``(group, n_docs, ws_tokens, bpe_tokens, fertility,
    chars_per_token)``."""
    t = F.col(text_col)
    per = df.select(
        F.col(group_col).alias("group"),
        token_count(t).alias("__ws"),
        bpe_ish_token_count(t).alias("__bpe"),
        F.length(t).cast("long").alias("__chars"),
    )
    agg = per.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ws").cast("long").alias("ws_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
        F.sum("__chars").cast("long").alias("__chars"),
    )
    fert = F.when(
        F.col("ws_tokens") > 0,
        F.col("bpe_tokens").cast("double") / F.col("ws_tokens").cast("double"),
    )
    cpt = F.when(
        F.col("bpe_tokens") > 0,
        F.col("__chars").cast("double") / F.col("bpe_tokens").cast("double"),
    )
    return agg.select(
        "group",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.round(fert, 4).alias("fertility"),
        F.round(cpt, 4).alias("chars_per_token"),
    )


def zipf_stats(
    df: DataFrame, top_n: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Corpus-level Zipf diagnostics in ONE row: OLS fit of
    ``ln(freq) ~ ln(rank)`` over the ``top_n`` most frequent terms
    (Zipf's law predicts slope ≈ −1; a corpus of boilerplate or
    templated spam bends it), plus the type-token ratio. Output
    ``(n_terms, n_tokens, ttr_bp, zipf_slope, zipf_intercept)``.

    Engine-exactness: ranks come from the deterministic total order
    ``(count DESC, term ASC)``; ``ln`` values snap to integer
    micro-units (the ``distinctive_terms`` discipline) so the four OLS
    sums are order-free integers in DECIMAL(38,0); slope/intercept are
    then single IEEE divisions of those exact integers — deterministic,
    rounded to 6 dp for display. ``ttr_bp`` is the exact integer
    ``floor(n_terms * 10000 / n_tokens)``.

    Scale shape: one (term) count aggregate over the corpus — the only
    corpus-sized exchange — then ``orderBy().limit(top_n)`` which Spark
    plans as TakeOrdered (per-partition partial top-n, no global sort
    shuffle); the OLS window + aggregate run on the ≤``top_n``-row
    relation. The term-count relation feeds both the top-n branch and
    the totals branch, so it is lineage-truncated once (the
    plan-hygiene rule). ``top_n`` is capped at 100_000 to keep the
    single-partition rank window honest — the fit needs only the head.
    """
    if not 2 <= top_n <= 100_000:
        raise ValueError("zipf_stats: top_n must be in [2, 100000]")
    counts = (
        df.select(F.explode(norm_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_tokens"),
    )

    def _lnu(x: Column) -> Column:
        return F.floor(F.log(x.cast("double")) * 1000000 + F.lit(0.5)).cast("long")

    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(top_n)
    ranked = top.select(
        _lnu(
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term")))
        ).alias("__x"),
        _lnu(F.col("cnt")).alias("__y"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ols = ranked.agg(
        d(F.count(F.lit(1))).alias("__n"),
        d(F.sum("__x")).alias("__sx"),
        d(F.sum("__y")).alias("__sy"),
        F.sum(d(F.col("__x")) * d(F.col("__y"))).alias("__sxy"),
        F.sum(d(F.col("__x")) * d(F.col("__x"))).alias("__sxx"),
    )
    num = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    den = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    # den = 0 when the head has < 2 distinct ranks (degenerate corpus):
    # slope/intercept are NULL, not a division error — same CASE in SQL
    slope = F.when(den > 0, num / den)
    intercept = F.when(
        den > 0,
        (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double"))
        / F.col("__n").cast("double")
        / 1e6,
    )
    fit = ols.select(
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )
    ttr = (
        (F.col("n_terms") * 10000 - F.pmod(F.col("n_terms") * 10000, F.col("n_tokens")))
        .cast("decimal(38,0)")
        / F.col("n_tokens").cast("decimal(38,0)")
    ).cast("long")
    return totals.crossJoin(F.broadcast(fit)).select(
        "n_terms",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, ttr).otherwise(F.lit(0)).alias("ttr_bp"),
        "zipf_slope",
        "zipf_intercept",
    )


def ngram_overlap_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ROUGE-N-style set overlap between two text columns of the SAME
    row — the paired-text QA signal (summary vs source, response vs
    instruction, translation vs original): how much of one side's
    n-gram vocabulary the other side reuses. Output ``(id, n_grams_a,
    n_grams_b, n_common, precision_bp, recall_bp, f1_bp)`` over DISTINCT
    word n-grams; precision = common/|A|, recall = common/|B| (B is the
    reference side), and — because these are set counts — F1 collapses
    to exactly ``2·common/(|A|+|B|)``. All three are basis-point floors
    of integer ratios; empty sides score 0, never divide-by-zero.

    Scale shape: everything is row-local Column arithmetic (shingle
    arrays built per row, ``array_intersect`` for the overlap) — a pure
    map with ZERO shuffle at any corpus size, unlike the corpus-keyed
    shingle relations the cross-document dedup family needs.
    """
    if n < 1:
        raise ValueError("ngram_overlap_stats: n must be >= 1")

    def sh(col: str) -> Column:
        toks = norm_tokens(col)
        if n == 1:
            return F.array_distinct(toks)
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        )

    sa, sb = sh(col_a), sh(col_b)
    rows = df.select(
        F.col(id_col),
        F.size(sa).cast("long").alias("n_grams_a"),
        F.size(sb).cast("long").alias("n_grams_b"),
        F.size(F.array_intersect(sa, sb)).cast("long").alias("n_common"),
    )

    def bp(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.floor(num * 10000 / den).cast("long")).otherwise(
            F.lit(0)
        )

    return rows.select(
        id_col,
        "n_grams_a",
        "n_grams_b",
        "n_common",
        bp(F.col("n_common"), F.col("n_grams_a")).alias("precision_bp"),
        bp(F.col("n_common"), F.col("n_grams_b")).alias("recall_bp"),
        bp(2 * F.col("n_common"), F.col("n_grams_a") + F.col("n_grams_b")).alias(
            "f1_bp"
        ),
    )


def encoding_artifacts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mojibake / encoding-damage detection — the cleaning signal a
    crawled corpus needs before any tokenizer sees it: per document,
    counts of (a) U+FFFD replacement characters (decode failures),
    (b) C0 control characters other than tab/newline/CR (binary bleed),
    (c) UTF-8-read-as-Latin-1 digraphs (``\u00c3\u00a9``-style: ``\u00c3``
    / ``\u00c2`` / ``\u00e2`` followed by a Latin-1 continuation byte —
    the classic double-encoding fingerprint), and (d) zero-width
    characters (ZWSP/ZWNJ/ZWJ/BOM — invisible token-splitters). Output
    ``(doc_id, n_chars, n_replacement, n_control, n_mojibake,
    n_zero_width, artifact_bp, is_damaged)`` with ``artifact_bp`` the
    basis-point floor of total artifacts over characters.

    Row-local regexp counts — a pure map, zero shuffle; patterns are
    RE2/Java-compatible literal classes so any engine counts the same.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    repl = F.regexp_count(t, F.lit("\ufffd")).cast("long")
    ctrl = F.regexp_count(
        t, F.lit("[\u0000-\u0008\u000b\u000c\u000e-\u001f]")
    ).cast("long")
    moji = F.regexp_count(
        t, F.lit("[\u00c3\u00c2\u00e2][\u0080-\u00ff]")
    ).cast("long")
    zw = F.regexp_count(
        t, F.lit("[\u200b\u200c\u200d\ufeff]")
    ).cast("long")
    total = repl + ctrl + moji + zw
    bp = F.when(n_chars > 0, F.floor(total * 10000 / n_chars).cast("long")).otherwise(
        F.lit(0)
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        repl.alias("n_replacement"),
        ctrl.alias("n_control"),
        moji.alias("n_mojibake"),
        zw.alias("n_zero_width"),
        bp.alias("artifact_bp"),
        (bp > 0).alias("is_damaged"),
    )


def vocab_divergence(
    df_a: DataFrame, df_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-vs-corpus unigram divergence in ONE row: ``(vocab_union,
    tokens_a, tokens_b, kl_ab, kl_ba, js)`` — the domain-shift /
    drift-detection report (is this month's crawl distributionally the
    same corpus? is the filtered set still representative?). KL and the
    bounded symmetric Jensen-Shannon divergence are in nats, over
    add-one-smoothed unigram distributions on the UNION vocabulary
    (so neither side ever has a zero that blows KL up).

    Engine-exactness: with V = |union vocab| and T = token count,
    p(w) = (c(w)+1)/(T+V) is a ratio of exact integers; every log term
    is ``ln`` of an exact-integer ratio snapped to micro-nats, each
    KL/JS sum is Σ (c+1)·lnu / denominator with the numerator summed in
    DECIMAL(38,0) — order-free, bit-identical at any partition count.
    The midpoint m = (p_a+p_b)/2 clears to the exact integer numerator
    ``(c_a+1)(T_b+V) + (c_b+1)(T_a+V)`` over ``2(T_a+V)(T_b+V)``.

    Scale shape: one count aggregate per corpus (map-side partials),
    a FULL OUTER join on the Zipf-small vocabularies, one global
    aggregate; the 1-row totals frames broadcast. Nothing corpus-sized
    survives past the first aggregates.
    """
    def counts(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(F.explode(norm_tokens(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias(f"c_{tag}"))
        )

    ca, cb = counts(df_a, "a"), counts(df_b, "b")
    # union vocab + both counts in one relation; feeds the totals AND the
    # divergence scan -> lineage-truncated once
    joint = (
        ca.join(cb, "word", "full_outer")
        .select(
            "word",
            F.coalesce("c_a", F.lit(0)).alias("c_a"),
            F.coalesce("c_b", F.lit(0)).alias("c_b"),
        )
        .localCheckpoint(eager=False)
    )
    totals = joint.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("c_a").cast("long").alias("t_a"),
        F.sum("c_b").cast("long").alias("t_b"),
    )

    def lnu(x) -> Column:
        return F.floor(F.log(x.cast("double")) * 1000000 + F.lit(0.5)).cast("long")

    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rows = joint.crossJoin(F.broadcast(totals))
    na, nb = F.col("c_a") + 1, F.col("c_b") + 1
    da, db = F.col("t_a") + F.col("v"), F.col("t_b") + F.col("v")
    # ln p_a - ln p_b = ln na - ln da - ln nb + ln db (each term snapped)
    ln_ab = lnu(na) - lnu(da) - lnu(nb) + lnu(db)
    # midpoint numerator / denominator: m = mnum / (2 da db)
    mnum = d(na) * d(db) + d(nb) * d(da)
    ln_a_m = lnu(na) - lnu(da) - lnu(mnum) + lnu(d(F.lit(2)) * d(da) * d(db))
    ln_b_m = lnu(nb) - lnu(db) - lnu(mnum) + lnu(d(F.lit(2)) * d(da) * d(db))
    agg = rows.agg(
        F.max("v").alias("v"),
        F.max("t_a").alias("t_a"),
        F.max("t_b").alias("t_b"),
        F.sum(d(na) * d(ln_ab)).alias("__kl_ab_num"),
        F.sum(d(nb) * d(-ln_ab)).alias("__kl_ba_num"),
        F.sum(d(na) * d(ln_a_m)).alias("__js_a_num"),
        F.sum(d(nb) * d(ln_b_m)).alias("__js_b_num"),
    )
    da2, db2 = F.col("t_a") + F.col("v"), F.col("t_b") + F.col("v")
    def val(num, den) -> Column:
        return F.round(
            num.cast("double") / den.cast("double") / 1000000.0, 6
        )
    return agg.select(
        F.coalesce("v", F.lit(0)).alias("vocab_union"),
        F.coalesce("t_a", F.lit(0)).alias("tokens_a"),
        F.coalesce("t_b", F.lit(0)).alias("tokens_b"),
        val(F.col("__kl_ab_num"), da2).alias("kl_ab"),
        val(F.col("__kl_ba_num"), db2).alias("kl_ba"),
        F.round(
            (
                F.col("__js_a_num").cast("double") / da2.cast("double")
                + F.col("__js_b_num").cast("double") / db2.cast("double")
            )
            / 2.0
            / 1000000.0,
            6,
        ).alias("js"),
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a reference
    vocabulary (r8) — the tokenizer/vocab-coverage check run before
    committing to a vocabulary: documents whose tokens mostly miss the
    vocab are the wrong language, the wrong domain, or gibberish, and a
    planned tokenizer that OOVs them will shred them into bytes.

    ``vocab`` is a one-column relation (``word``). Output:
    ``(id_col, n_tokens, n_oov, oov_bp)`` with ``oov_bp`` the floor
    basis-point ratio; empty documents are absent (no tokens — no
    defined rate), matching the other token-ratio reports here.

    Scale shape: the vocabulary is broadcast (vocabularies are
    bounded by construction); the corpus explodes once, LEFT-probes the
    broadcast, and aggregates on the unique doc key — map-side
    partials collapse everything, one perfectly uniform exchange.
    """
    v = F.broadcast(
        vocab.select(F.col("word").cast("string").alias("word"))
        .distinct()
        .withColumn("__in", F.lit(1))
    )
    toks = df.select(
        F.col(id_col), F.explode(norm_tokens(text_col)).alias("word")
    ).filter(F.col("word") != "")
    per = (
        toks.join(v, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return per.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.expr("(n_oov * 10000) div n_tokens").cast("long").alias("oov_bp"),
    )
