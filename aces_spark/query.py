"""Query orchestration (SURVEY §3.3; reference ``src/aces/query.py:19-197``).

``query(cfg, predicates_df)`` runs the full pipeline lazily:

1. optionally validate ``(subject_id, timestamp)`` uniqueness (the
   reference always does, ``query.py:110-115``; here it is an opt-in flag
   because it forces an extra aggregation pass over a 100 TB input);
2. static/demographic filter OR drop null-timestamp rows
   (``query.py:121-127``);
3. trigger anchors via the count-constraint filter (``query.py:133-140``);
4. recursive window-tree evaluation;
5. rename the anchor to ``trigger``; extract ``label`` /
   ``index_timestamp`` from their windows' struct summaries
   (``query.py:153-196``);
6. project output columns in window-tree pre-order (``query.py:155-159``).

Physical plan choices: the predicates DataFrame is cached before the
recursion (every tree edge re-reads it — the reference reuses its eager
in-memory frame the same way), and the trigger-anchor set is the most
selective relation in the plan, so it is joined first at every level.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import TaskExtractorConfig
from .operators.constraints import check_constraints, check_static_variables
from .plans.extract_subtree import extract_subtree
from .plans.fused import can_fuse, extract_subtree_fused
from .utils import preorder_iter

logger = logging.getLogger(__name__)


def query(
    cfg: TaskExtractorConfig,
    predicates_df: DataFrame,
    validate_uniqueness: bool = False,
    cache: bool = True,
    checkpoint: bool = False,
    fused: bool | None = None,
) -> DataFrame:
    """Extract the cohort realizations for ``cfg`` from ``predicates_df``.

    Returns one row per valid trigger realization with columns
    ``subject_id``, optional ``index_timestamp``, optional ``label``,
    ``trigger`` (anchor timestamp), then one struct column per window-tree
    node in pre-order (reference ``src/aces/query.py:155-197``).
    """
    if validate_uniqueness:
        total = predicates_df.count()
        distinct = predicates_df.select("subject_id", "timestamp").distinct().count()
        if total != distinct:
            raise ValueError("The (subject_id, timestamp) columns must be unique.")

    static_variables = [p for p in cfg.predicates if cfg.predicates[p].static]
    if static_variables:
        predicates_df = check_static_variables(static_variables, predicates_df)
    else:
        predicates_df = predicates_df.filter(
            F.col("subject_id").isNotNull() & F.col("timestamp").isNotNull()
        )

    use_fused = can_fuse(cfg.window_tree) if fused is None else fused
    if use_fused:
        # anchor-stable tree (all internal edges temporal): evaluate as ONE
        # windowed pipeline with zero joins and no cache — see plans/fused.py
        result = extract_subtree_fused(
            cfg.window_tree, predicates_df, F.col(cfg.trigger.predicate) >= 1
        )
    else:
        if cache:
            # the recursion re-reads this frame at every tree edge through
            # the cache; without this conf AQE treats the cached plan's
            # output partitioning as unknown and re-shuffles the FULL frame
            # once per window kernel (3 redundant exchanges on the flagship
            # task, ~2× wall). Dynamic conf, safe to set per-session.
            try:
                predicates_df.sparkSession.conf.set(
                    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
                )
            except Exception:  # pragma: no cover - conf may be static on some builds
                pass
            predicates_df = predicates_df.cache()

        prospective_root_anchors = check_constraints(
            {cfg.trigger.predicate: (1, None)}, predicates_df
        ).select("subject_id", F.col("timestamp").alias("subtree_anchor_timestamp"))

        result = extract_subtree(
            cfg.window_tree, prospective_root_anchors, predicates_df, checkpoint=checkpoint,
            # an explicit fused=False means "pure general path" (the
            # differential tests rely on the two planners being independent)
            subtree_fusion=fused is None,
        )

    result = result.withColumnRenamed("subtree_anchor_timestamp", "trigger")

    to_return_cols = [
        "subject_id",
        "trigger",
        *[f"{node.node_name}_summary" for node in preorder_iter(cfg.window_tree)][1:],
    ]

    if cfg.label_window:
        label_col = "end" if cfg.windows[cfg.label_window].root_node == "start" else "start"
        result = result.withColumn(
            "label",
            F.col(f"`{cfg.label_window}.{label_col}_summary`.`{cfg.windows[cfg.label_window].label}`"),
        )
        to_return_cols.insert(1, "label")

    if cfg.index_timestamp_window:
        index_timestamp_col = (
            "end" if cfg.windows[cfg.index_timestamp_window].root_node == "start" else "start"
        )
        result = result.withColumn(
            "index_timestamp",
            F.col(
                f"`{cfg.index_timestamp_window}.{index_timestamp_col}_summary`"
                f".`timestamp_at_{cfg.windows[cfg.index_timestamp_window].index_timestamp}`"
            ),
        )
        to_return_cols.insert(1, "index_timestamp")

    return result.select(*[F.col(f"`{c}`") for c in to_return_cols])
