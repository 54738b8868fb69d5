"""Blocked fuzzy string join: symmetric-delete candidate generation plus
exact Levenshtein verification.

The reference engine has no string-similarity join; this belongs to the
beyond-reference LLM-pipeline surface (entity resolution: near-identical
titles, author names, product strings, OCR'd tokens). The algorithm is
the public symmetric-delete scheme (Garbe's SymSpell): two strings
within edit distance ``k`` always share at least one variant obtainable
by deleting at most ``k`` characters from each, so an equi-join on the
exploded delete-variant sets yields a candidate SUPERSET (recall 1.0)
that an exact ``levenshtein`` filter then trims to the true pairs.

Scale shape: explode (narrow, ~``len**k`` variants per string) → ONE
hash-partitioned equi-join on the variant string → distinct candidate
pairs → narrow verify. No cartesian anywhere, no UDFs — ``levenshtein``
and the variant construction are JVM intrinsics, and the join key
(short variant strings) hash-partitions evenly. At 100 TB the explode
factor is the knob: ``max_dist=1`` costs ~``len`` rows per string,
``max_dist=2`` ~``len^2/2`` — both linear in corpus size, versus the
quadratic cartesian a naive distance join needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hard cap on value length for the delete-variant stage — depth-2
#: variants grow like len²/2, so a 10 kB value would explode to ~50M rows
MAX_FUZZY_LEN = 512


def _del1_sql(x: str) -> str:
    """SQL for the set of strings obtained by deleting exactly one
    character from ``x`` (empty array for the empty string — the
    ``sequence(1, 0)`` guard matters: Spark's sequence auto-steps
    DOWNWARD for start > stop, which would fabricate variants)."""
    return (
        f"CASE WHEN length({x}) = 0 THEN array() "
        f"ELSE transform(sequence(1, length({x})), i -> "
        f"concat(substring({x}, 1, i - 1), substring({x}, i + 1, length({x})))) END"
    )


def delete_variants(col: str, max_dist: int = 1):
    """Column of distinct delete-variants of ``col`` up to depth
    ``max_dist`` (the string itself included). ``max_dist`` in {1, 2}:
    depth-k variant counts grow like ``len**k``, and SymSpell's own
    guidance is that k>2 stops paying for itself against verification."""
    if max_dist not in (1, 2):
        raise ValueError("delete_variants: max_dist must be 1 or 2")
    d1 = _del1_sql(col)
    if max_dist == 1:
        return F.expr(f"array_distinct(concat(array({col}), {d1}))")
    d2 = _del1_sql("y")
    return F.expr(
        f"array_distinct(concat(array({col}), {d1}, "
        f"flatten(transform({d1}, y -> {d2}))))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    *,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of DISTINCT string values ``(left_str, right_str,
    dist)`` with ``levenshtein(left_str, right_str) <= max_dist``.

    Joins on values, not rows: callers re-attach their payload columns
    with an equi-join on the string, which keeps the expensive stage —
    the variant join — proportional to the number of distinct strings,
    not the number of rows. Null values are dropped; empty strings
    participate (the empty string is within distance 1 of every
    single-character string, via the shared ``""`` variant).

    Values longer than ``MAX_FUZZY_LEN`` (512) raise: depth-2 variants
    grow like ``len²/2``, so one pathological 10 kB "string" would
    explode to ~50M variant rows — edit-distance matching on strings
    that long is a different problem (use the shingle operators);
    failing loudly beats silently materializing the blowup.
    """
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_join: max_dist must be 1 or 2")
    right_col = right_col if right_col is not None else left_col
    l = (
        left.select(F.col(left_col).cast("string").alias("left_str"))
        .filter(F.col("left_str").isNotNull())
        .distinct()
    )
    r = (
        right.select(F.col(right_col).cast("string").alias("right_str"))
        .filter(F.col("right_str").isNotNull())
        .distinct()
    )
    # explicit length contract (see docstring): raise distributed-side on
    # the first over-long value rather than exploding len²/2 variants
    guard = (
        "CASE WHEN length({c}) > {n} THEN "
        "raise_error(concat('fuzzy_join: value longer than {n} chars "
        "(len=', length({c}), ') — use shingle-based matching for long "
        "text')) ELSE {c} END"
    )
    l = l.select(F.expr(guard.format(c="left_str", n=MAX_FUZZY_LEN)).alias("left_str"))
    r = r.select(F.expr(guard.format(c="right_str", n=MAX_FUZZY_LEN)).alias("right_str"))
    lv = l.select(
        "left_str", F.explode(delete_variants("left_str", max_dist)).alias("__v")
    )
    rv = r.select(
        "right_str", F.explode(delete_variants("right_str", max_dist)).alias("__v")
    )
    cand = lv.join(rv, "__v").select("left_str", "right_str").distinct()
    return (
        cand.withColumn("dist", F.levenshtein("left_str", "right_str"))
        .filter(F.col("dist") <= max_dist)
        .select("left_str", "right_str", F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_self_pairs(
    df: DataFrame, col: str, *, max_dist: int = 1
) -> DataFrame:
    """Unordered near-match pairs within one column: ``fuzzy_join`` of
    the distinct values against themselves, keeping each pair once
    (``left_str < right_str`` — identical values are never a pair)."""
    return fuzzy_join(df, df, col, col, max_dist=max_dist).filter(
        F.col("left_str") < F.col("right_str")
    )


def resolve_entities(
    df: DataFrame, col: str, *, max_dist: int = 1, max_iter: int = 50
) -> DataFrame:
    """Entity resolution over one string column: link every pair of
    distinct values within edit distance ``max_dist`` (the symmetric-
    delete blocked join above — never a cartesian), take the TRANSITIVE
    closure, and label each value with its entity. Returns
    ``(value, entity_id, entity_size)`` — ``entity_id`` the
    lexicographically smallest member (the canonical surface form under
    a min-rule), values with no near-match forming singleton entities.

    The classic record-linkage composition: blocking → pairwise match →
    clustering → canonicalization, each stage the repo's scale-safe
    primitive (delete-variant equi-join; large-star/small-star
    ``connected_components``, O(log² n) rounds with lineage truncation).
    A min-string canonical is deliberately deterministic; smarter
    canonicals (most frequent variant) are a ``keep_best``-style join
    away and left to callers.
    """
    from .clusters import dedup_clusters

    vals = (
        df.select(F.col(col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    pairs = fuzzy_self_pairs(vals, "value", max_dist=max_dist)
    out = dedup_clusters(
        vals, pairs, id_col="value", src="left_str", dst="right_str",
        max_iter=max_iter,
    )
    return out.select(
        F.col("doc_id").alias("value"),
        F.col("cluster_id").alias("entity_id"),
        F.col("cluster_size").cast("long").alias("entity_size"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    col: str,
    *,
    window: int = 3,
    max_dist: int = 2,
    prefix: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo): sort the
    distinct values, compare each only against its ``window`` following
    neighbors, verify with exact ``levenshtein``. Returns
    ``(left_str, right_str, dist)`` with ``left_str < right_str``.

    The complementary blocker to :func:`fuzzy_join`: symmetric-delete
    explodes ~``len^k`` variants per string (hard-capped at 512 chars)
    and guarantees recall 1.0 for edit distance; sorted-neighborhood
    costs O(w) comparisons per value at ANY length and ANY distance
    function, but recall is heuristic — near-matches sorting far apart
    (e.g. a first-character typo) are missed, the classic trade-off.

    Scale shape: values first block on their ``prefix``-char key, the
    sort + rank window runs WITHIN blocks (parallel across blocks — a
    single global sort window would serialize the corpus through one
    partition), and the neighbor join is one equi-join on
    ``(block, rank bucket)`` realized as ``window`` rank-shifted copies
    of the (value, rank) relation — rows ~ |values|·w, never quadratic.
    Pairs straddling a block boundary are missed like any blocking
    scheme's; shrink ``prefix`` (bigger blocks) or union with
    :func:`fuzzy_self_pairs` when recall matters more than cost.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if prefix < 1:
        raise ValueError("prefix must be >= 1")
    from pyspark.sql import Window as W

    vals = (
        df.select(F.col(col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .select(
            "value", F.substring("value", 1, prefix).alias("__blk")
        )
        .withColumn(
            "__rk",
            F.row_number().over(W.partitionBy("__blk").orderBy("value")),
        )
        # referenced 1 + window times below — truncate or Catalyst plans
        # the distinct + rank pipeline once per shifted copy
        .localCheckpoint(eager=False)
    )
    left = vals.select("__blk", F.col("value").alias("left_str"), "__rk")
    pairs = None
    for off in range(1, window + 1):
        right = vals.select(
            "__blk",
            F.col("value").alias("right_str"),
            (F.col("__rk") - off).alias("__rk"),
        )
        p = left.join(right, ["__blk", "__rk"]).select("left_str", "right_str")
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.withColumn("dist", F.levenshtein("left_str", "right_str"))
        .filter(F.col("dist") <= max_dist)
        .select(
            "left_str", "right_str", F.col("dist").cast("long").alias("dist")
        )
    )
