"""Document chunking and corpus-frequency rarity scoring.

Chunking is the step between cleaning and packing in a training-data
pipeline: long documents become overlapping fixed-size token windows
(the context-window slicer every pretraining corpus runs).  Rarity
scoring is the CCNet-style two-pass quality signal: score each document
by how much of it is made of corpus-rare tokens (high rare fraction →
boilerplate-free but possibly noisy text; near-zero → templated text).

Scale shapes:

- ``chunk_documents`` is completely NARROW — tokenize, compute the
  window count per document, ``posexplode`` a chunk-index sequence, and
  ``slice`` out each window.  No shuffle at all; at 100 TB this is a
  map-only pass whose output partitioning follows the input.
- ``rare_token_stats`` is two hash aggregates on word keys (explode →
  corpus counts; explode → join → per-doc rollup).  The vocabulary join
  is word-keyed and Zipf-skewed on the head, but the head words are
  exactly the NON-rare ones — the rarity flag only needs ``count <=
  max_count``, so the vocab side is pre-filtered to the rare tail
  (bounded, usually broadcast-able) and joined as a LEFT join with null
  → non-rare.  The heavy head never enters the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = ["chunk_documents", "rare_token_stats"]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping windows of ``chunk_tokens``
    normalized word tokens, advancing ``stride`` tokens per window (the
    sliding-context slicer; ``stride < chunk_tokens`` gives overlap).

    Output: ``(doc_col, chunk_idx, n_chunks, chunk_text, n_chunk_tokens)``.
    A document with no tokens yields no rows; a document shorter than one
    window yields exactly one (possibly short) chunk.  The window count is
    ``1 + ceil(max(0, n - chunk_tokens) / stride)`` — the last window may
    be shorter than ``chunk_tokens`` but always starts within the text.

    Narrow plan: tokenize → ``posexplode(sequence(...))`` → ``slice`` —
    no exchange; chunk rows inherit the input partitioning.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = df.select(
        F.col(doc_col), norm_tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    nonempty = toks.filter(F.col("__n") > 0)
    # integer ceil: 1 + floor((n - chunk + stride - 1) / stride) for n > chunk
    extra = F.greatest(F.col("__n") - chunk_tokens, F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((extra + stride - 1) / stride).cast("long")
    ).alias("n_chunks")
    seq = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    exploded = nonempty.select(
        F.col(doc_col),
        n_chunks,
        F.col("__toks"),
        F.posexplode(seq).alias("chunk_idx", "__i"),
    )
    window = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(doc_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_chunks"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
    )


def rare_token_stats(
    df: DataFrame,
    max_count: int = 2,
    doc_col: str = "doc_id",
    text_col: str = "text",
    broadcast_rare: bool = False,
) -> DataFrame:
    """Two-pass corpus rarity score: a token is *rare* when its total
    occurrence count across the corpus is <= ``max_count``; each document
    reports how much of it is rare.

    Output: ``(doc_col, n_tokens, n_rare, rare_frac)`` — ``rare_frac`` in
    integer basis points (``floor(x*10000 + 0.5)/10000``) so the value is
    bit-identical across engines (same rule as ``text.quality_expr``).

    Plan shape: pass 1 aggregates corpus counts by word and keeps ONLY
    the rare tail (``count <= max_count``); pass 2 left-joins document
    tokens against that tail (null → non-rare) and rolls up per document.
    The Zipf head — the skew risk in any word-keyed join — is filtered
    out before the join by construction.  Set ``broadcast_rare`` when the
    rare tail is known to fit on executors; left to AQE otherwise.
    """
    words = df.select(F.col(doc_col), F.explode(norm_tokens(text_col)).alias("word"))
    rare = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") <= max_count)
        .select("word", F.lit(1).alias("__rare"))
    )
    if broadcast_rare:
        rare = F.broadcast(rare)
    flagged = words.join(rare, "word", "left")
    per_doc = flagged.groupBy(doc_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.coalesce(F.col("__rare"), F.lit(0))).cast("long").alias("n_rare"),
    )
    frac = F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")
    return per_doc.select(
        F.col(doc_col),
        "n_tokens",
        "n_rare",
        (F.floor(frac * 10000 + 0.5).cast("double") / 10000.0).alias("rare_frac"),
    )
