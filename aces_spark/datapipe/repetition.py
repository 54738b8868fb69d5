"""Gopher-style repetition quality filters for pretraining corpora.

The repetition gates from the Gopher/MassiveText cleaning recipe (Rae et
al. 2021, §A.1.1): documents dominated by duplicated lines or by a single
over-represented word n-gram are boilerplate/spam and get filtered before
training. Two families of signals:

* **duplicate-line fractions** — the fraction of line *occurrences* that
  are repeats of an earlier identical line, and the fraction of line
  *characters* inside those repeats.
* **top n-gram character fraction** — the share of the (normalized)
  document occupied by its single most frequent word n-gram.

Scale shape: both signals explode per-item rows and aggregate with
map-side partial aggregation — the shuffle keys are ``(doc_id, line)`` /
``(doc_id, gram)``, uniform by construction (doc_id dominates the key), and
the final join is a co-partitioned doc_id equi-join. No window over the
whole corpus, no skew pivot. Everything is Column-expression-only (no
Python UDFs) with exact DuckDB-SQL equivalents for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _norm_tokens


def _nonblank_lines(text: Column) -> Column:
    """Non-blank lines of ``text`` (split on newline, blank lines dropped)."""
    return F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)


def duplicate_line_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document duplicate-line statistics.

    Returns ``(doc_id, n_lines, dup_line_frac, dup_line_char_frac)``:

    * ``dup_line_frac`` — ``1 - n_distinct_lines / n_lines``: the fraction
      of line occurrences beyond the first occurrence of their text.
    * ``dup_line_char_frac`` — characters inside those repeat occurrences
      over total line characters.

    Documents with no non-blank lines get zeros (never dropped).
    """
    lines = df.select(
        "doc_id", F.explode(_nonblank_lines(F.col(text_col))).alias("line")
    )
    lc = lines.groupBy("doc_id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_len = F.length(F.col("line"))
    stats = lc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("cnt").cast("double"), 4
        ).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("cnt") - 1) * line_len)
            / F.greatest(F.sum(F.col("cnt") * line_len), F.lit(1)).cast("double"),
            4,
        ).alias("dup_line_char_frac"),
    )
    base = df.select("doc_id")
    return base.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce(F.col("dup_line_frac"), F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce(F.col("dup_line_char_frac"), F.lit(0.0)).alias("dup_line_char_frac"),
    )


def top_ngram_stats(df: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Per-document most-frequent word n-gram and the fraction of the
    normalized document's characters it covers.

    Returns ``(doc_id, top_gram, top_gram_cnt, top_gram_char_frac)`` where
    ``top_gram_char_frac = cnt * len(gram) / len(normalized_text)`` —
    the Gopher "top n-gram character fraction". Ties break on the
    lexicographically smallest gram (deterministic). Documents shorter
    than ``n`` tokens get ``('', 0, 0.0)``.
    """
    tokens = _norm_tokens(text_col)
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(0), F.size(tokens) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    norm_len = F.length(F.array_join(tokens, " "))

    base = df.select("doc_id", norm_len.alias("__norm_len"))
    g = df.select("doc_id", F.explode(grams).alias("gram"))
    gc = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    top = gc.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)

    return base.join(top, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("gram"), F.lit("")).alias("top_gram"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("top_gram_cnt"),
        F.round(
            F.coalesce(
                F.col("cnt") * F.length(F.col("gram"))
                / F.greatest(F.col("__norm_len"), F.lit(1)).cast("double"),
                F.lit(0.0),
            ),
            4,
        ).alias("top_gram_char_frac"),
    )


def repetition_stats(df: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Combined Gopher repetition signals: :func:`duplicate_line_stats` ⨝
    :func:`top_ngram_stats`, one row per input document."""
    return duplicate_line_stats(df, text_col).join(
        top_ngram_stats(df, n, text_col), "doc_id"
    )


def boilerplate_line_stats(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-document boilerplate lines (the CCNet/RefinedWeb cleaning
    signal the per-document Gopher stats above can't see): non-blank
    lines appearing verbatim in ``>= min_docs`` DISTINCT documents —
    nav menus, cookie banners, footers. Output ``(line, n_docs)``.

    Scale shape: distinct ``(doc_id, line)`` then a count keyed on
    ``line`` — both aggregates take map-side partials; a line repeated
    inside one hot document collapses locally before the shuffle, so a
    boilerplate storm never skews the exchange.
    """
    if min_docs < 2:
        raise ValueError("boilerplate_line_stats: min_docs must be >= 2")
    lines = df.select(
        F.col(id_col), F.explode(_nonblank_lines(F.col(text_col))).alias("line")
    ).distinct()
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove cross-document boilerplate lines from every document
    (CCNet line-level cleanup): drop each non-blank line that appears in
    ``>= min_docs`` distinct documents, reassemble the survivors in
    original order. Output ``(doc_id, text_clean, n_lines_kept,
    n_lines_dropped)`` — documents whose every line is boilerplate (or
    that had no non-blank lines) survive with empty ``text_clean``,
    never dropped, so the caller decides the fate of emptied docs.

    ONE corpus-sized line relation feeds both the frequency branch and
    the strip branch — lineage-truncated (the plan-hygiene rule) so the
    explode isn't replayed per branch. The strip is a LEFT join with a
    flag + a single per-doc aggregate counting kept and total together
    (the contamination_fraction one-pass discipline), never a second
    corpus read; reassembly sorts the surviving ``(pos, line)`` structs
    per doc — positions are per-document, so the sort is row-local.
    """
    if min_docs < 2:
        raise ValueError("strip_boilerplate_lines: min_docs must be >= 2")
    lines = df.select(
        F.col(id_col),
        F.posexplode(_nonblank_lines(F.col(text_col))).alias("pos", "line"),
    ).localCheckpoint(eager=False)
    bp = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("line", F.lit(True).alias("__bp"))
    )
    kept_struct = F.when(
        F.col("__bp").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    agg = (
        lines.join(bp, "line", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n_lines"),
            F.count(F.when(F.col("__bp").isNull(), 1)).cast("long").alias(
                "__n_kept"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("__text_clean"),
        )
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("__text_clean", F.lit("")).alias("text_clean"),
        F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.coalesce("__n_lines", F.lit(0)) - F.coalesce("__n_kept", F.lit(0)))
        .cast("long")
        .alias("n_lines_dropped"),
    )
