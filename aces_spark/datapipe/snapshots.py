"""Cross-snapshot diffing: what changed between two drops of a table.

The companion to incremental-ingest dedup (``dedup.dedup_against``): when
a new crawl/export lands, the first question is "how different is it" —
added / removed / changed / unchanged keys — both as a gate (a 90%-removed
drop is a broken upstream, not a real delta) and as the work-list for
incremental downstream recompute (only ``added ∪ changed`` needs
reprocessing).

Plan shape: each side reduces to ``(key, md5 digest of the compared
columns)`` row-locally, then ONE full-outer equi-join on the key decides
the status per key. Digests make the join payload constant-width no
matter how wide the table is — at 100 TB the exchange moves ~48 bytes a
row, not the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_diff_summary"]

#: distinct from any real value AND from the empty string, so null vs ''
#: vs absent column values cannot collide in the digest
_NULL_SENTINEL = "\x00null\x00"


def _digest(df: DataFrame, key_col: str, compare_cols: list[str] | None):
    if compare_cols is None:
        compare_cols = [c for c in df.columns if c != key_col]
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
        for c in compare_cols
    ]
    return df.select(
        F.col(key_col),
        F.md5(F.concat_ws("\x01", *parts)).alias("__digest"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of two snapshots. Output: ``(key_col, status)`` with
    status ∈ ``added`` (key only in new), ``removed`` (only in old),
    ``changed`` (both, compared columns differ), ``unchanged``.

    Keys must be unique per snapshot (run ``validation.check_rules`` with
    a ``unique`` rule first if unsure); duplicate keys make the full-outer
    join multiply rows.
    """
    o = _digest(old, key_col, compare_cols).withColumnRenamed("__digest", "__d_old")
    n = _digest(new, key_col, compare_cols).withColumnRenamed("__digest", "__d_new")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") == F.col("__d_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(key_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per status with counts and the fraction of the UNION key
    space (exact basis points) — the gate report. Statuses with zero keys
    are still emitted (stable 4-row schema for alerting thresholds)."""
    diff = snapshot_diff(old, new, key_col, compare_cols)
    counts = diff.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    statuses = diff.sparkSession.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)], "status string"
    )
    full = statuses.join(counts, "status", "left").select(
        "status", F.coalesce("n_keys", F.lit(0)).cast("long").alias("n_keys")
    )
    total = F.sum("n_keys").over(Window.partitionBy())
    frac = F.col("n_keys").cast("double") / total.cast("double")
    return full.select(
        "status",
        "n_keys",
        (F.floor(frac * 10000 + 0.5).cast("double") / 10000.0).alias("key_frac"),
    )
