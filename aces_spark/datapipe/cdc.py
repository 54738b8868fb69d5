"""Change-data-capture application: SCD type-2 history merge.

The lakehouse upsert primitive (Delta/Iceberg ``MERGE`` with history
retention, Kimball's slowly-changing-dimension type 2): given the
current dimension history and a batch of changed rows stamped with an
effective timestamp, close out superseded versions and append the new
ones, keeping every historical version queryable by validity interval
(the as-of join in ``operators/timeseries.py`` is the natural reader).

Plan shape: ONE key-keyed exchange. History and changes union (tagged),
one window per key in (effective_from, is_change) order computes each
row's successor start = its ``valid_to``. No join at all — the same
union-tag trick as the as-of join, so a key with millions of versions
costs O(n) window state, and change batches of any size merge in one
pass. (A join-based MERGE touches the history twice: once to match,
once to anti-join the unmatched. This shape reads it once.)

Semantics:
- a change row with a key not in history ⇒ plain insert (open-ended)
- a change row for an existing key ⇒ the latest overlapping version
  closes at the change's ``effective_from``; the change opens there
- multiple changes for one key in one batch chain correctly (each
  closes at the next change's timestamp)
- a change identical in payload to the current version still versions
  (idempotence is the CALLER's dedup concern — ``snapshot_diff`` gives
  the changed-keys list to pre-filter with)
- ``valid_to`` is null for the current version; intervals are half-open
  ``[valid_from, valid_to)`` matching the repo's interval operators
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    effective_col: str = "effective_from",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    change_order: str | None = None,
) -> DataFrame:
    """Merge a change batch into an SCD2 history.

    ``history`` carries ``key_col``, payload columns, ``valid_from_col``,
    ``valid_to_col`` (null = current). ``changes`` carries ``key_col``,
    the same payload columns, and ``effective_col``. Returns the merged
    history with the same schema as ``history``.

    A change landing INSIDE a closed interval truncates it and is itself
    bounded by that interval's ORIGINAL endpoint — a deletion gap in the
    history stays a gap (the change must not extend validity across a
    period where the key was absent); a change landing in a gap is a
    re-insert. Multiple changes for one key chain in effective order.

    ``change_order``: integral column disambiguating two changes sharing
    the same ``(key, effective_from)`` — the LARGEST wins (its same-
    instant predecessors collapse to empty intervals and drop). Without
    it such duplicates are nondeterministic; pre-dedup or pass it.
    """
    payload = [
        c
        for c in history.columns
        if c not in (key_col, valid_from_col, valid_to_col)
    ]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing payload columns: {missing}")
    if effective_col not in changes.columns:
        raise ValueError(f"changes is missing {effective_col!r}")

    ord_expr = (
        F.col(change_order).cast("long") if change_order else F.lit(0).cast("long")
    )
    h = history.select(
        F.col(key_col),
        *[F.col(c) for c in payload],
        F.col(valid_from_col).alias("__from"),
        F.col(valid_to_col).alias("__to"),
        F.lit(0).alias("__is_change"),
        F.lit(0).cast("long").alias("__ord"),
    )
    c = changes.select(
        F.col(key_col),
        *[F.col(cc) for cc in payload],
        F.col(effective_col).alias("__from"),
        F.lit(None).cast(history.schema[valid_to_col].dataType).alias("__to"),
        F.lit(1).alias("__is_change"),
        ord_expr.alias("__ord"),
    )
    tagged = h.unionByName(c)

    # (from, is_change, ord): a change at the same instant as an existing
    # version supersedes it (sorts after → the version closes at its own
    # start: empty half-open interval, dropped below); same-instant
    # changes resolve by __ord, largest surviving
    w = Window.partitionBy(key_col).orderBy(
        F.col("__from").asc(), F.col("__is_change").asc(), F.col("__ord").asc()
    )
    nxt = F.lead("__from").over(w)
    # the enclosing interval's ORIGINAL endpoint: the latest history
    # row's __to at or before this row (wrapped in a struct so an OPEN
    # endpoint — null __to — still counts as "seen a history row")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry = F.last(
        F.when(F.col("__is_change") == 0, F.struct(F.col("__to").alias("t"))),
        ignorenulls=True,
    ).over(run)
    bound = carry.getField("t")
    merged = tagged.withColumn(
        "__new_to",
        # ONE rule for both sides: close at the enclosing endpoint when it
        # is real, after this row's start, and earlier than the successor;
        # otherwise at the successor. For a history row the "enclosing
        # endpoint" is its own __to (already-truncated history stays
        # truncated; a gap before the successor stays a gap); for a change
        # it is the interval it landed in (a mid-interval change inherits
        # the deletion boundary, a gap/open-version change runs to nxt).
        F.when(
            bound.isNotNull()
            & (bound > F.col("__from"))
            & (nxt.isNull() | (bound < nxt)),
            bound,
        ).otherwise(nxt),
    )
    # drop versions emptied by a same-instant supersession
    merged = merged.filter(
        F.col("__new_to").isNull() | (F.col("__new_to") > F.col("__from"))
    )
    return merged.select(
        F.col(key_col),
        *[F.col(p) for p in payload],
        F.col("__from").alias(valid_from_col),
        F.col("__new_to").alias(valid_to_col),
    )
