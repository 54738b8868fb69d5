"""Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) —
train merge rules on a corpus and apply them, all in DataFrame ops.

The tokenizer-training stage of a data pipeline: given a corpus, learn
the ``n_merges`` most frequent adjacent symbol pairs (characters up) and
the resulting subword vocabulary. The classic algorithm is inherently
iterative (each merge changes the pair statistics), so this is a DRIVER
LOOP — but over the right relation:

Scale shape: the 100 TB corpus is touched ONCE (one hash aggregate to
the word-frequency table); every merge iteration then runs on that
Zipf-small vocab relation (|distinct words| rows, NOT corpus rows) —
pair-count aggregate, 1-row argmax collect (the sanctioned driver hop),
and a map-only fold applying the merge. ``n_merges`` Spark jobs over a
small cached table, zero corpus re-reads. Real tokenizer training (50k
merges) exports the word table once and finishes driver-side or in an
offline tool; this operator is the in-engine variant for modest merge
counts (ablations, vocabulary studies, domain-adapter vocabularies).

Determinism: merge selection is (count desc, left asc, right asc); the
merge application is the standard greedy left-to-right non-overlapping
fold. A pure-Python reference implementation lives in the tests and the
two are differential-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = ["bpe_train", "bpe_encode", "word_freq_table"]

#: end-of-word marker (the Sennrich convention): lets merges distinguish
#: word-final from word-internal occurrences
_EOW = "</w>"


def word_freq_table(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The ONE corpus pass: normalized words with counts, each word as
    its initial symbol array (characters + ``</w>``). Output
    ``(word, n, symbols)``."""
    words = corpus.select(
        F.explode(norm_tokens(text_col)).alias("word")
    ).groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))
    symbols = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(_EOW))
    )
    return words.select("word", "n", symbols.alias("symbols"))


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with its concatenation — the BPE merge step, as a
    JVM higher-order fold (no UDF)."""
    lw, rw = F.lit(left), F.lit(right)
    # try_element_at: null (→ condition falls through) on the empty
    # accumulator instead of an ANSI out-of-bounds error — `&` does not
    # short-circuit in SQL. A just-merged symbol cannot immediately
    # re-merge as the LEFT of the same rule: concat(left,right) == left
    # is impossible for non-empty right, so last(acc) == left is exactly
    # "unmerged occurrence of left" — greedy non-overlap for free.
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == lw) & (s == rw),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(lw, rw))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the vocab table: each word
    contributes (its count) × (each adjacent symbol pair)."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select("n", F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").cast("long").alias("pair_count"))
    )


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merge rules. Returns ``[(left, right,
    pair_count), ...]`` in merge order. Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes the corpus).

    Each iteration: pair-count aggregate over the cached vocab table →
    1-row argmax collect → map-only merge fold. The vocab table is
    re-cached every iteration and the corpus is never re-read.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    # lazy persist discipline: each iteration's ONE driver-blocking job is
    # the argmax collect, and that job materializes the (lazily) persisted
    # vocab table as a side effect — no separate count() job per merge,
    # and the LAST iteration's fold is never computed at all (its result
    # feeds no further pair count). The previous table is released only
    # AFTER the collect that materialized its successor, so no lineage
    # ever recomputes from the corpus.
    vocab = word_freq_table(corpus, text_col).select("n", "symbols").persist()
    merges: list[tuple[str, str, int]] = []
    prev: DataFrame | None = None
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            # this collect materialized `vocab`'s cache; its predecessor
            # can go now
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["pair_count"] < min_pair_count:
                break
            left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
            merges.append((left, right, cnt))
            nxt = vocab.select(
                "n", _merge_fold(F.col("symbols"), left, right).alias("symbols")
            ).persist()
            prev, vocab = vocab, nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with learned merges: per word, apply every merge in rule
    order (the BPE inference convention), then flatten. Output
    ``(id_col, tokens array<string>, n_tokens)``.

    The merges compile to a CHAIN of JVM folds — expression depth grows
    with ``len(merges)``, fine for the modest rule counts
    :func:`bpe_train` targets; export the rules to an offline tokenizer
    for 50k-merge production vocabularies.
    """
    word_tokens = F.concat(F.split(F.col("__w"), ""), F.array(F.lit(_EOW)))
    sym: Column = word_tokens
    for rule in merges:
        sym = _merge_fold(sym, rule[0], rule[1])
    toks = df.select(
        F.col(id_col), F.posexplode(norm_tokens(text_col)).alias("__pos", "__w")
    ).select(F.col(id_col), F.col("__pos"), sym.alias("__sym"))
    # order-preserving reassembly: collect_list has no ordering guarantee
    # after a shuffle, so words carry their position and sort on it
    out = toks.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__sym"))),
                lambda s: s["__sym"],
            )
        ).alias("tokens")
    )
    # zero-token documents (empty / punctuation-only text) explode to no
    # rows — join back so they surface as (id, [], 0) instead of silently
    # vanishing from the output
    ids = df.select(id_col).distinct()
    return ids.join(out, id_col, "left").select(
        id_col,
        F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        F.coalesce(F.size("tokens"), F.lit(0)).cast("long").alias("n_tokens"),
    )
