"""Fused planner (plans/fused.py) vs the general recursion — exact
differential equivalence across random trees and frames, plus plan-shape
guarantees (join-free, single exchange)."""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F

from aces_spark.config import (
    EventConfig,
    PlainPredicateConfig,
    TaskExtractorConfig,
    WindowConfig,
)
from aces_spark.plans.fused import can_fuse
from aces_spark.query import query

DT = datetime.datetime
EPOCH = DT(2020, 1, 1)


def _rand_frame(spark, seed, n_subj=12, max_events=25):
    rng = random.Random(seed)
    rows = []
    for sid in range(1, n_subj + 1):
        times = sorted(rng.sample(range(0, 24 * 90), rng.randint(1, max_events)))
        for t in times:
            rows.append(
                (
                    sid,
                    EPOCH + datetime.timedelta(hours=t),
                    rng.randint(0, 2),  # trig
                    1 if rng.random() < 0.2 else 0,  # bnd
                    rng.randint(0, 3),  # x
                )
            )
    return spark.createDataFrame(
        rows, "subject_id long, timestamp timestamp, trig long, bnd long, x long"
    )


PREDS = {
    "trig": PlainPredicateConfig("t"),
    "bnd": PlainPredicateConfig("b"),
    "x": PlainPredicateConfig("x"),
}


def _configs():
    """Tree shapes covering chains, multi-child, event-bound leaves in both
    directions, constraints incl. anti-constraints, labels/indexes."""
    cfgs = {}

    cfgs["temporal_chain"] = TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "gap": WindowConfig(
                start="trigger", end="start + 12h",
                start_inclusive=True, end_inclusive=True, index_timestamp="end",
            ),
            "tgt": WindowConfig(
                start="gap.end", end="start + 48h",
                start_inclusive=False, end_inclusive=True,
                has={"x": "(2, None)"}, label="bnd",
            ),
        },
    )

    cfgs["event_bound_leaf_fwd"] = TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "obs": WindowConfig(
                start="trigger", end="start + 24h",
                start_inclusive=True, end_inclusive=True,
            ),
            "fu": WindowConfig(
                start="obs.end", end="start -> bnd",
                start_inclusive=False, end_inclusive=True,
            ),
        },
    )

    cfgs["event_bound_leaf_bwd"] = TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "hist": WindowConfig(
                start="end <- bnd", end="trigger",
                start_inclusive=False, end_inclusive=True,
                has={"x": "(1, None)"},
            ),
        },
    )

    cfgs["multi_child"] = TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "back": WindowConfig(
                start="end - 24h", end="trigger",
                start_inclusive=True, end_inclusive=False,
                has={"bnd": "(None, 0)"},
            ),
            "fwd": WindowConfig(
                start="trigger", end="start + 36h",
                start_inclusive=False, end_inclusive=True,
                has={"x": "(1, None)"}, label="bnd",
            ),
            "until": WindowConfig(
                start="trigger", end="start -> bnd",
                start_inclusive=False, end_inclusive=True,
            ),
        },
    )

    cfgs["record_end_leaf"] = TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "rest": WindowConfig(
                start="trigger", end="start -> _RECORD_END",
                start_inclusive=False, end_inclusive=True,
            ),
        },
    )

    return cfgs


def _rows_key(df):
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize("name", list(_configs()))
@pytest.mark.parametrize("seed", [1, 4])
def test_fused_matches_general(spark, name, seed):
    cfg = _configs()[name]
    assert can_fuse(cfg.window_tree), f"{name} should be fuse-eligible"
    df = _rand_frame(spark, seed)
    got = _rows_key(query(cfg, df, fused=True))
    want = _rows_key(query(cfg, df, fused=False))
    assert got == want
    assert len(got) > 0 or name == "event_bound_leaf_bwd"  # fixtures dense enough


def test_fused_junk_row_semantics(spark):
    """A pure chain ending in an unresolved event-bound leaf emits one
    (subject, null) row — identical in both planners."""
    cfg = TaskExtractorConfig(
        predicates={"trig": PlainPredicateConfig("t"), "bnd": PlainPredicateConfig("b")},
        trigger=EventConfig("trig"),
        windows={
            "w": WindowConfig(
                start="trigger", end="start -> bnd",
                start_inclusive=False, end_inclusive=True,
            )
        },
    )
    df = spark.createDataFrame(
        [
            (1, DT(2020, 1, 1), 1, 0),
            (1, DT(2020, 1, 2), 0, 1),
            (2, DT(2020, 1, 1), 1, 0),
            (2, DT(2020, 1, 2), 0, 0),
        ],
        "subject_id long, timestamp timestamp, trig long, bnd long",
    )
    got = _rows_key(query(cfg, df, fused=True))
    want = _rows_key(query(cfg, df, fused=False))
    assert got == want
    assert any("subject_id=2, trigger=None" in r for r in got)


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_fused_is_join_free_single_exchange(spark):
    """The fused physical plan contains no join operators; a pure temporal
    tree needs exactly one hash exchange (the subject_id window
    partitioning). The chain + event-bound-leaf shape adds only the
    junk-row union's distinct (one more exchange over two columns)."""
    df = _rand_frame(spark, 2)

    plan = _plan(spark, query(_configs()["temporal_chain"], df, fused=True))
    assert "Join" not in plan
    assert plan.count(") Exchange") <= 1

    plan = _plan(spark, query(_configs()["event_bound_leaf_fwd"], df, fused=True))
    assert "Join" not in plan
    assert plan.count(") Exchange") <= 2


def _mixed_tree_cfg():
    """Event-bound INTERNAL node (not fuse-eligible as a whole) with a
    temporal subtree hanging below it."""
    return TaskExtractorConfig(
        predicates=PREDS,
        trigger=EventConfig("trig"),
        windows={
            "adm": WindowConfig(
                start="trigger", end="start -> bnd",
                start_inclusive=False, end_inclusive=True,
            ),
            "post": WindowConfig(
                start="adm.end", end="start + 24h",
                start_inclusive=False, end_inclusive=True,
                has={"x": "(1, None)"}, label="bnd",
            ),
            "tail": WindowConfig(
                start="post.end", end="start + 48h",
                start_inclusive=False, end_inclusive=True,
            ),
        },
    )


def test_fused_not_used_for_internal_event_bound(spark):
    """Trees with event-bound INTERNAL nodes are not fuse-eligible as a
    whole."""
    assert not can_fuse(_mixed_tree_cfg().window_tree)


@pytest.mark.parametrize("seed", [1, 5])
def test_subtree_fusion_matches_pure_general(spark, seed):
    """The auto path fuses the temporal subtree below the event-bound hop;
    results must match the pure general recursion exactly."""
    cfg = _mixed_tree_cfg()
    df = _rand_frame(spark, seed)
    got = _rows_key(query(cfg, df, fused=None))  # auto: general + subtree fusion
    want = _rows_key(query(cfg, df, fused=False))  # pure general
    assert got == want
    assert len(got) > 0
