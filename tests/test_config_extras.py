"""Config-layer coverage: predicates overlay files, node splicing, error
paths, shard expansion, and the MEDS label sink on edge inputs."""

from __future__ import annotations

import textwrap
from datetime import datetime

import pytest

from aces_spark import (
    DerivedPredicateConfig,
    TaskExtractorConfig,
    WindowConfig,
    parse_timedelta,
    preorder_iter,
)
from aces_spark.sources.expand_shards import expand_shards

BASE_CFG = """\
trigger: admission
windows:
  obs:
    start: trigger
    end: start + 24h
    start_inclusive: True
    end_inclusive: True
"""

PRED_OVERLAY = """\
metadata:
  description: overlay
predicates:
  admission:
    code: ADMISSION//OVERLAY
patient_demographics:
  male:
    code: GENDER//MALE
"""


def test_predicates_overlay(tmp_path):
    """An external predicates file supplies/overrides predicates and
    demographics (reference ``src/aces/config.py:1296-1324``)."""
    cfg_p = tmp_path / "task.yaml"
    cfg_p.write_text(BASE_CFG)
    overlay_p = tmp_path / "preds.yaml"
    overlay_p.write_text(PRED_OVERLAY)
    cfg = TaskExtractorConfig.load(cfg_p, overlay_p)
    assert cfg.predicates["admission"].code == "ADMISSION//OVERLAY"
    assert cfg.predicates["male"].static is True


def test_overlay_wins_over_base(tmp_path):
    cfg_p = tmp_path / "task.yaml"
    cfg_p.write_text(
        "predicates:\n  admission:\n    code: ADMISSION//BASE\n" + BASE_CFG
    )
    overlay_p = tmp_path / "preds.yaml"
    overlay_p.write_text(PRED_OVERLAY)
    cfg = TaskExtractorConfig.load(cfg_p, overlay_p)
    assert cfg.predicates["admission"].code == "ADMISSION//OVERLAY"


def test_unreferenced_predicates_dropped(tmp_path):
    cfg_p = tmp_path / "task.yaml"
    cfg_p.write_text(
        textwrap.dedent(
            """\
            predicates:
              admission:
                code: A
              unused:
                code: B
            trigger: admission
            windows:
              obs:
                start: trigger
                end: start + 24h
                start_inclusive: True
                end_inclusive: True
            """
        )
    )
    cfg = TaskExtractorConfig.load(cfg_p)
    assert "unused" not in cfg.predicates


def test_zero_offset_node_splice():
    """`end: trigger + 0h` collapses the edge; the no-op node is spliced
    out of the tree (reference ``src/aces/config.py:679-681, :1642-1664``)."""
    cfg = TaskExtractorConfig(
        predicates={"a": __import__("aces_spark").PlainPredicateConfig("a")},
        trigger=__import__("aces_spark").EventConfig("a"),
        windows={
            "w": WindowConfig("trigger + 0h", "start + 24h", True, True),
        },
    )
    names = [n.name for n in preorder_iter(cfg.window_tree)]
    assert names == ["trigger", "w.end"]


def test_derived_predicate_errors():
    with pytest.raises(ValueError, match="non-empty"):
        DerivedPredicateConfig("")
    with pytest.raises(ValueError, match="start with"):
        DerivedPredicateConfig("P1 + P2")
    with pytest.raises(ValueError, match="at least two"):
        DerivedPredicateConfig("and(one)")


def test_window_direction_errors():
    with pytest.raises(ValueError, match="will not occur before"):
        WindowConfig("end + 24h", "trigger", True, True)
    with pytest.raises(ValueError, match="Exactly one"):
        WindowConfig("end", "start", True, True)
    with pytest.raises(ValueError, match="cannot progress"):
        WindowConfig(None, None, True, True)


def test_constraint_parse_errors():
    with pytest.raises(ValueError, match="Invalid constraint format"):
        WindowConfig("trigger", "start + 1d", True, True, has={"a": "(1, 2, 3)"})


def test_expand_shards():
    assert expand_shards("train/4") == "train/0,train/1,train/2,train/3"
    assert expand_shards("data/data_2") == "data/data_0,data/data_1"
    with pytest.raises(ValueError, match="Invalid shard format"):
        expand_shards("train.invalid")


def test_parse_timedelta_errors():
    with pytest.raises(ValueError):
        parse_timedelta("not a duration")
    with pytest.raises(ValueError):
        parse_timedelta("3 fortnights")


def test_meds_labels_empty_frame(spark):
    """An empty result still yields the full MEDS label schema
    (reference ``src/aces/run.py:154-160``)."""
    from aces_spark.sources.sinks import to_meds_labels

    empty = spark.createDataFrame(
        [], "subject_id long, index_timestamp timestamp, label long, trigger timestamp"
    )
    out = to_meds_labels(empty)
    assert [f.name for f in out.schema.fields] == [
        "subject_id", "prediction_time", "boolean_value", "integer_value", "float_value",
        "categorical_value",
    ]
    assert out.count() == 0


def test_bucketed_predicates_sink_zero_exchange(spark):
    """A predicates frame persisted via ``write_bucketed_predicates`` reads
    back with hashpartitioning(subject_id) already satisfied: a subject-keyed
    aggregation over ``spark.table(...)`` plans with NO Exchange node.

    This is the write-once/query-many production path — one MEDS corpus,
    dozens of cohort tasks — where the engine's single subject shuffle moves
    to write time.
    """
    from aces_spark.sources.sinks import write_bucketed_predicates

    df = spark.createDataFrame(
        [(1, datetime(2020, 1, 1), 1), (1, datetime(2020, 1, 2), 0), (2, datetime(2020, 1, 1), 1)],
        "subject_id long, timestamp timestamp, lab long",
    )
    table = "test_bucketed_preds"
    try:
        write_bucketed_predicates(df, table, n_buckets=4)
        back = spark.table(table)
        agg = back.groupBy("subject_id").sum("lab")
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {r["subject_id"]: r["sum(lab)"] for r in agg.collect()}
        assert got == {1: 1, 2: 1}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_window_stats_sink(spark, tmp_path):
    from aces_spark.sources.sinks import write_result

    df = spark.createDataFrame(
        [(1, datetime(2020, 1, 1), 1, datetime(2020, 1, 1))],
        "subject_id long, index_timestamp timestamp, label long, trigger timestamp",
    )
    out_p = str(tmp_path / "labels.parquet")
    stats_p = str(tmp_path / "stats.parquet")
    write_result(df, out_p, meds_labels=True, window_stats_path=stats_p)
    labels = spark.read.parquet(out_p)
    stats = spark.read.parquet(stats_p)
    assert labels.columns[:2] == ["subject_id", "prediction_time"]
    assert labels.collect()[0]["boolean_value"] is True
    assert stats.columns == ["subject_id", "index_timestamp", "label", "trigger"]
