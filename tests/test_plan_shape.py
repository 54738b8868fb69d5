"""Physical-plan regression guards: the scale properties ARCHITECTURE.md
promises must stay true — one data exchange per kernel, column pruning at
the MEDS scan, broadcast joins for the recursion's anchor sets."""

from __future__ import annotations

import contextlib
import io
import re
from datetime import datetime, timedelta

import pytest

from aces_spark import (
    PlainPredicateConfig,
    TemporalWindowBounds,
    ToEventWindowBounds,
    aggregate_event_bound_window,
    aggregate_temporal_window,
)
from aces_spark.sources.predicates import plain_predicates_from_meds_df


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _node_counts(df) -> dict[str, int]:
    out: dict[str, int] = {}
    for line in _plan(df).splitlines():
        m = re.match(r"^\s*\(\d+\)\s+(\w+)", line)
        if m:
            out[m.group(1)] = out.get(m.group(1), 0) + 1
    return out


@pytest.fixture(scope="module")
def pred_df(spark):
    rows = [
        (i % 5, datetime(2020, 1, 1) + timedelta(minutes=i), "a" if i % 3 else "b", float(i))
        for i in range(200)
    ]
    meds = spark.createDataFrame(
        rows, "subject_id long, timestamp timestamp, code string, numeric_value float"
    )
    return plain_predicates_from_meds_df(
        meds, {"is_a": PlainPredicateConfig("a"), "is_b": PlainPredicateConfig("b")}
    )


def test_temporal_kernel_single_exchange(pred_df):
    out = aggregate_temporal_window(
        pred_df, TemporalWindowBounds(True, timedelta(hours=1), True, None)
    )
    counts = _node_counts(out)
    assert counts.get("Exchange", 0) == 1, counts


def test_event_bound_kernel_single_exchange_and_no_joins(pred_df):
    out = aggregate_event_bound_window(
        pred_df, ToEventWindowBounds(True, "is_a", True, timedelta(hours=1))
    )
    counts = _node_counts(out)
    assert counts.get("Exchange", 0) == 1, counts
    assert not any("Join" in k for k in counts), counts


@pytest.mark.parametrize("mode_name", ["fwd", "bwd"])
def test_event_bound_kernel_no_shrinking_frames(pred_df, mode_name):
    """Neither kernel direction may emit an unboundedfollowing range frame:
    Spark evaluates those by re-scanning the rest of the partition for every
    row (O(n²) per subject — a skewed 100k-event subject stalls its task).
    The backward fill is expressed as a growing frame over the negated key
    instead; this guard keeps it that way."""
    end_event = "is_a" if mode_name == "fwd" else "-is_a"
    out = aggregate_event_bound_window(
        pred_df, ToEventWindowBounds(True, end_event, True, None)
    )
    plan = _plan(out).lower()
    assert "unboundedfollowing$()" not in plan.replace(" ", ""), plan


def test_meds_scan_column_pruning(spark, tmp_path):
    """Only predicate-referenced source columns reach the parquet scan."""
    rows = [(1, datetime(2020, 1, 1), "a", 1.0, "extra", 42)]
    spark.createDataFrame(
        rows,
        "subject_id long, time timestamp, code string, numeric_value float, "
        "text_value string, other long",
    ).write.mode("overwrite").parquet(str(tmp_path / "meds.parquet"))
    from aces_spark.sources.predicates import generate_plain_predicates_from_meds

    df = generate_plain_predicates_from_meds(
        spark, tmp_path / "meds.parquet", {"is_a": PlainPredicateConfig("a")}
    )
    plan = _plan(df)
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    assert "text_value" not in m.group(1) and "other" not in m.group(1), m.group(1)
    assert "numeric_value" not in m.group(1), m.group(1)  # no value constraint → pruned
