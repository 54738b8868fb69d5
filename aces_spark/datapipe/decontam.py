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


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """NEAR-duplicate benchmark contamination: corpus documents whose
    MinHash signature collides with a benchmark document's in at least
    one LSH band — the fuzzy sibling of :func:`decontaminate`, catching
    the paraphrased / lightly-edited eval leak the exact n-gram rule
    misses (whitespace tweaks, reordered sentences, trailing additions).
    The public decontamination appendices (Llama, GPT-4) describe
    exactly this two-tier scheme: exact n-gram PLUS a fuzzy pass.

    Output: distinct ``(doc_id, bench_id)`` candidate contamination
    pairs (band collision at these parameters ~ Jaccard >= ~(1/bands)
    ^ (bands/num_hashes); verify downstream if precision matters — for
    decontamination, recall is what counts and dropping a candidate
    costs one training doc).

    Scale shape: the benchmark is small by definition, so its banded
    signatures BROADCAST — the corpus side is one signature aggregate
    (its only exchange, keyed by unique doc_id) and a map-side probe
    join; no corpus self-join, no corpus-vs-corpus shuffle. Signatures
    use the engine-portable md5 hasher so the operator is oracle-
    differentiable bit-for-bit.
    """
    from .dedup import minhash_signatures

    def banded(sig: DataFrame, id_col: str) -> DataFrame:
        rows_per_band = num_hashes // bands
        if rows_per_band * bands != num_hashes:
            raise ValueError("num_hashes must be divisible by bands")
        band_exprs = []
        for b in range(bands):
            cols = [
                F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)
            ]
            band_exprs.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws("_", *cols)).alias("bucket"),
                )
            )
        return sig.select(
            F.col(id_col), F.explode(F.array(*band_exprs)).alias("bb")
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    corpus_b = banded(
        minhash_signatures(corpus, n, num_hashes, text_col), "doc_id"
    )
    bench_sig = minhash_signatures(
        benchmark.withColumnRenamed(bench_id_col, "doc_id"), n, num_hashes, text_col
    ).withColumnRenamed("doc_id", bench_id_col)
    bench_b = banded(bench_sig, bench_id_col)
    return (
        corpus_b.join(F.broadcast(bench_b), ["band", "bucket"])
        .select("doc_id", bench_id_col)
        .distinct()
    )
