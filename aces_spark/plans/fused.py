"""Fused window-tree planner: join-free evaluation for anchor-stable trees.

Spark-first optimization with no counterpart in the reference (its recursion
always materializes + joins per edge, ``src/aces/extract_subtree.py:279-386``).

Key observation: a temporal edge keeps the child anchored on the SAME event
row (``extract_subtree.py:300-310`` — child anchor = row timestamp), so in a
tree where every *internal* edge is temporal (event-bound edges only at
leaves), every node's window summary is indexed by the original event row.
The whole recursion then collapses into ONE windowed scan:

* each node's window sums/timestamps are appended as prefixed columns
  (kernels in append mode — same ``subject_id`` hash partitioning, shared
  sorts, zero shuffles beyond the input's single exchange);
* anchor-set joins (J1) become row-wise validity flags (trigger ≥ 1 AND
  each node's constraint check AND, for event-bound leaves, a resolved
  boundary);
* sibling-intersection joins (J4) become conjunction of the leaf flags;
* child→parent remap joins (J2/J3) vanish — the anchor never moves.

This preserves the general path's exact semantics, including the junk row it
emits per subject when a pure single-child chain ends in an event-bound leaf
with no qualifying boundary (the reference's null-key join behavior: the
realization is replaced by one ``(subject, null)`` row with null summaries).
Verified by differential tests (``tests/test_fused.py``) against the general
planner across random trees/frames.

At scale this is the difference between kernel-bound throughput (~3M rows/s
per 32 cores) and join-bound throughput (~0.3M rows/s) on dense-trigger
tasks — see ``tools/scale_probe.py``.
"""

from __future__ import annotations

import dataclasses
from datetime import timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.aggregate import aggregate_temporal_window, boolean_expr_bound_sum
from ..types import ANY_EVENT_COLUMN, TemporalWindowBounds
from ..utils import Node, preorder_iter

ANCHOR = "subtree_anchor_timestamp"


def can_fuse(tree: Node) -> bool:
    """A tree fuses iff every edge to a non-leaf child is temporal — i.e.
    anchors never move off the original event row mid-tree."""
    for node in preorder_iter(tree):
        for child in node.children:
            if child.children and not isinstance(child.endpoint_expr, TemporalWindowBounds):
                return False
    return True


def _constraint_keep(
    constraints: dict[str, tuple[int | None, int | None]], prefix: str
) -> Column:
    """Row-wise equivalent of ``check_constraints`` over prefixed sum
    columns (same validation, same ``"*"`` alias)."""
    should_drop = F.lit(False)
    for col, (mn, mx) in constraints.items():
        if (mn is None and mx is None) or (mn is not None and mx is not None and mx < mn):
            raise ValueError(f"Invalid constraint for '{col}': {mn} - {mx}")
        if col == "*":
            col = ANY_EVENT_COLUMN
        drop = F.lit(False)
        if mn is not None:
            drop = drop | (F.col(f"{prefix}{col}") < mn)
        if mx is not None:
            drop = drop | (F.col(f"{prefix}{col}") > mx)
        should_drop = should_drop | drop
    return ~should_drop


def fusible_without_junk(tree: Node) -> bool:
    """Fuse-eligible AND free of the chain-censoring junk-row case — the
    shape where a fused subtree can substitute for the general recursion
    mid-tree (its result is then inner-joined to the anchor set once,
    which would wrongly drop junk rows if any were emitted)."""
    if not can_fuse(tree):
        return False
    if not _is_chain(tree):
        return True
    node = tree
    while node.children:
        node = node.children[0]
    return isinstance(node.endpoint_expr, TemporalWindowBounds)


def extract_subtree_fused(
    subtree: Node,
    predicates_df: DataFrame,
    root_valid: Column,
    initial_offset: timedelta = timedelta(0),
) -> DataFrame:
    """Evaluate a fuse-eligible window tree in one windowed pipeline.

    Returns the same shape as the general ``extract_subtree`` after anchor
    selection: ``(subject_id, subtree_anchor_timestamp, {node}_summary...)``
    with one row per valid trigger realization. ``initial_offset`` folds an
    accumulated parent offset in when a subtree is fused mid-recursion.
    """
    pred_cols = [c for c in predicates_df.columns if c not in ("subject_id", "timestamp")]

    if not subtree.children:
        return predicates_df.filter(root_valid).select(
            "subject_id", F.col("timestamp").alias(ANCHOR)
        )

    df = predicates_df.withColumn("__valid_root", root_valid)

    node_info: list[tuple[Node, str]] = []  # (node, prefix) in walk order
    leaf_valid_cols: list[str] = []
    junk_cond: Column | None = None  # pure-chain + event-bound-leaf censoring
    counter = 0

    def walk(node: Node, offset: timedelta, parent_valid: str) -> None:
        nonlocal df, counter, junk_cond
        for child in node.children:
            counter += 1
            pfx = f"__n{counter}_"
            eff = dataclasses.replace(
                child.endpoint_expr, offset=child.endpoint_expr.offset + offset
            )
            boundary_null: Column | None = None
            if isinstance(eff, TemporalWindowBounds):
                df = aggregate_temporal_window(
                    df, eff, prefix=pfx, append=True, value_cols=pred_cols
                )
                child_offset = offset + eff.window_size
            else:
                kw = eff.bound_sum_kwargs
                df = boolean_expr_bound_sum(
                    df,
                    kw["boundary"],
                    kw["mode"],
                    kw["closed"],
                    kw["offset"],
                    prefix=pfx,
                    append=True,
                    value_cols=pred_cols,
                )
                bnd_side = (
                    "timestamp_at_start" if kw["mode"] == "bound_to_row" else "timestamp_at_end"
                )
                boundary_null = F.col(f"{pfx}{bnd_side}").isNull()
                child_offset = timedelta(0)

            keep = _constraint_keep(child.constraints, pfx)
            valid = F.col(parent_valid) & keep
            if boundary_null is not None:
                # the general path drops anchors whose boundary is unresolved
                # (their null child anchor never re-joins); see module doc
                valid = valid & ~boundary_null
                if len(node.children) == 1 and junk_cond is None and _is_chain(subtree):
                    junk_cond = F.col(parent_valid) & keep & boundary_null
            vcol = f"{pfx}valid"
            df = df.withColumn(vcol, valid)
            node_info.append((child, pfx))
            if child.children:
                walk(child, child_offset, vcol)
            else:
                leaf_valid_cols.append(vcol)

    walk(subtree, initial_offset, "__valid_root")

    all_valid = F.col(leaf_valid_cols[0])
    for vc in leaf_valid_cols[1:]:
        all_valid = all_valid & F.col(vc)

    struct_cols = []
    for child, pfx in node_info:
        struct_cols.append(
            F.struct(
                F.lit(child.name).alias("window_name"),
                F.col(f"{pfx}timestamp_at_start").alias("timestamp_at_start"),
                F.col(f"{pfx}timestamp_at_end").alias("timestamp_at_end"),
                *[F.col(f"{pfx}{c}").alias(c) for c in pred_cols],
            ).alias(f"{child.name}_summary")
        )

    result = df.filter(F.coalesce(all_valid, F.lit(False))).select(
        "subject_id", F.col("timestamp").alias(ANCHOR), *struct_cols
    )

    if junk_cond is not None:
        struct_types = {
            f.name: f.dataType for f in result.schema.fields if f.name.endswith("_summary")
        }
        junk = (
            df.filter(F.coalesce(junk_cond, F.lit(False)))
            .select("subject_id")
            .distinct()
            .select(
                "subject_id",
                F.lit(None).cast("timestamp").alias(ANCHOR),
                *[
                    F.lit(None).cast(dt).alias(name)
                    for name, dt in struct_types.items()
                ],
            )
        )
        result = result.unionByName(junk)

    return result


def _is_chain(tree: Node) -> bool:
    node = tree
    while node.children:
        if len(node.children) != 1:
            return False
        node = node.children[0]
    return True
