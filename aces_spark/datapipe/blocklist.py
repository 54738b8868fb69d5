"""Phrase-blocklist matching and filtering — the corpus-curation gate
every production pipeline runs (bad-word / NSFW / spam-phrase lists à
la C4's banned-word filter, RefinedWeb's URL+phrase blocklists): given
a list of (possibly multi-word) phrases, count exact token-sequence
matches per document and drop documents over a hit budget.

Spark-first design, sized for 100 TB corpora × 10⁵-phrase blocklists:

1. Tokens are normalized once (``text.norm_tokens`` — the corpus-wide
   tokenize contract), phrases through the same normalizer.
2. Each phrase elects an ANCHOR token: its token with the globally
   RAREST corpus occurrence count (ties broken by token string, then
   in-phrase offset — fully deterministic). Anchoring on the rarest
   token is the PPJoin prefix-filter discipline applied to phrase
   search: candidate volume is Σ occ(anchor) instead of
   Σ occ(first-token), which collapses when phrases contain stopwords
   ("the bad thing" anchors on "bad", not "the").
3. One ``posexplode`` of the corpus tokens (narrow — position+token
   only, the token ARRAY is not replicated through the explode), a
   broadcast join against the anchor table, then a doc-keyed join-back
   fetches each candidate's token array ONCE per candidate to verify
   the full slice equality. Candidates ≪ positions, so the verify join
   moves a candidate-sized relation, not a corpus-sized one.
4. Per-doc aggregate: total hits (overlapping matches count
   separately) + distinct phrases hit.

Every step is exact-integer / exact-string relational work — no UDFs,
no floats — so the whole operator value-hashes against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import norm_tokens

__all__ = ["blocklist_hits", "blocklist_filter", "normalize_phrases"]


def normalize_phrases(phrases: list[str]) -> list[list[str]]:
    """Phrases through the corpus tokenizer contract — the SAME
    normalizer documents go through (:func:`~aces_spark.datapipe.text.
    norm_tokens_py`, the pure-Python twin of ``norm_tokens``), so
    phrase and document tokenization can never diverge; empty results
    dropped."""
    from .text import norm_tokens_py

    out = []
    for p in phrases:
        toks = norm_tokens_py(p)
        if toks:
            out.append(toks)
    if not out:
        raise ValueError("blocklist: no non-empty phrases after normalization")
    return out


def _anchored_phrases(docs_tokens: DataFrame, phr: list[list[str]]) -> DataFrame:
    """The anchor table: one row per phrase —
    ``(pid, ptoks, plen, anchor_tok, anchor_off)`` with the anchor the
    phrase token of minimal ``(corpus occurrence count, token)`` and
    ``anchor_off`` its first in-phrase position. One corpus token
    aggregate (the occ counts are Zipf-small) + driver-side election
    over the tiny phrase list — the blocklist is driver-known by
    definition."""
    spark = docs_tokens.sparkSession
    vocab = set()
    for p in phr:
        vocab.update(p)
    occ_rows = (
        docs_tokens.select(F.explode("__toks").alias("tok"))
        .filter(F.col("tok").isin(list(vocab)))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("occ"))
        .collect()
    )  # ≤ |blocklist vocab| rows — the sanctioned bounded driver hop
    occ = {r["tok"]: r["occ"] for r in occ_rows}
    rows = []
    for pid, p in enumerate(phr):
        anchor = min(p, key=lambda t: (occ.get(t, 0), t))
        rows.append((pid, p, len(p), anchor, p.index(anchor)))
    return F.broadcast(
        spark.createDataFrame(
            rows,
            "pid long, ptoks array<string>, plen int, anchor_tok string, anchor_off int",
        )
    )


def blocklist_hits(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document blocklist report: ``(doc_id, n_hits, n_phrases)``
    for every document with ≥ 1 exact token-sequence match —
    ``n_hits`` counts (phrase, position) matches (overlaps count),
    ``n_phrases`` the distinct phrases that hit."""
    phr = normalize_phrases(phrases)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), norm_tokens(text_col).alias("__toks")
    ).localCheckpoint(eager=False)  # feeds the occ agg, the position
    # explode, AND the verify join-back — truncate once
    anchors = _anchored_phrases(toks, phr)

    pos = toks.select(
        "doc_id", F.posexplode("__toks").alias("__i", "__tok")
    )
    cand = (
        pos.join(anchors, pos["__tok"] == anchors["anchor_tok"])
        .select(
            "doc_id",
            "pid",
            "ptoks",
            "plen",
            (F.col("__i") - F.col("anchor_off")).alias("__start"),
        )
        .filter(F.col("__start") >= 0)
    )
    verified = (
        cand.join(toks, "doc_id")
        .filter(
            F.slice(F.col("__toks"), F.col("__start") + 1, F.col("plen"))
            == F.col("ptoks")
        )
    )
    return verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.countDistinct("pid").cast("long").alias("n_phrases"),
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: list[str],
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The gate: documents with at most ``max_hits`` blocklist matches
    survive — ``(doc_id, text, n_hits)`` (``n_hits = 0`` for clean
    docs). The C4 rule is ``max_hits = 0``; a budget > 0 is the softer
    RefinedWeb-style variant."""
    hits = blocklist_hits(docs, phrases, id_col, text_col)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .join(hits.select("doc_id", "n_hits"), "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .filter(F.col("n_hits") <= max_hits)
    )
