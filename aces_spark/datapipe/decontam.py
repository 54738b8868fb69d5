"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard pretraining-hygiene pass (the n-gram overlap rule popularized
by the GPT-3/PaLM/Llama reports, all public): a training doc is
*contaminated* if it shares at least ``min_overlap`` distinct word
n-grams with any benchmark document. No analog in the reference engine —
this is part of the large-scale training-data surface.

Scale shape (the reason this is linear at 100 TB): the benchmark side is
small by definition (eval sets are MBs, the corpus is TBs), so its
distinct shingle set is collected into a **broadcast** hash relation; the
corpus side is exploded once (narrow), probe-joined with zero shuffle,
and the per-doc overlap count aggregates on ``doc_id`` — a key that is
unique per document, so the exchange is perfectly uniform and map-side
partial aggregation collapses almost everything before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: ``(doc_id, n_overlap)`` for
    corpus docs sharing ≥ ``min_overlap`` distinct word ``n``-grams with
    the benchmark set. Compose with a left-anti join to drop them:

    >>> clean = corpus.join(decontaminate(corpus, bench), "doc_id", "left_anti")  # doctest: +SKIP

    Both sides tokenize through :func:`aces_spark.datapipe.text.norm_tokens`
    (case/punctuation-insensitive, like every n-gram op here). The shingle
    string never leaves the executors — both sides collapse it to a 64-bit
    xxhash immediately, shrinking the broadcast and the probe keys
    (collision odds ~|shingles|²/2⁶⁴, immaterial to an overlap count).
    """
    bench_sh = (
        word_shingles(benchmark, n, text_col)
        .select(F.xxhash64(F.col("shingle")).alias("shingle"))
        .distinct()
    )
    corpus_sh = word_shingles(corpus, n, text_col).select(
        "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def contamination_fraction(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination REPORT: for every corpus doc with at
    least one word ``n``-gram, the fraction of its distinct shingles
    found in the benchmark set — the number the GPT-3/PaLM-style
    contamination appendices actually publish (a distribution, not just
    a flag; :func:`decontaminate` is the flag form). Returns
    ``(doc_id, n_shingles, n_overlap, frac)`` with ``frac`` in basis
    points (floor rule). Docs shorter than ``n`` words have no shingles
    and no defined fraction — they are absent, not 0.

    Scale shape: deliberately ONE pass over the corpus-sized shingle
    relation — a broadcast LEFT join against the benchmark hash set
    marks hits, and a single per-doc aggregate counts total and matched
    shingles together. (The naive plan — count shingles per doc, then
    separately join-and-count overlaps — reads the corpus relation
    twice or forces a checkpoint of something corpus-sized; the hit
    mark costs one broadcast probe per row instead.) Same xxhash64
    collapse as :func:`decontaminate`: the overlap COUNT is hash-
    insensitive at ~|shingles|²/2⁶⁴ collision odds.
    """
    bench_sh = (
        word_shingles(benchmark, n, text_col)
        .select(F.xxhash64(F.col("shingle")).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_sh = word_shingles(corpus, n, text_col).select(
        "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
    )
    per = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_overlap"),
        )
    )
    frac = (
        F.floor(
            F.col("n_overlap").cast("double")
            / F.col("n_shingles").cast("double")
            * 10000
            + F.lit(0.5)
        ).cast("double")
        / 10000.0
    )
    return per.select("doc_id", "n_shingles", "n_overlap", frac.alias("frac"))
