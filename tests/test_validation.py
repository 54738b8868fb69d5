"""Tests for datapipe/validation.py — single-pass rule checking."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aces_spark.datapipe.validation import check_rules


def _df(spark):
    rows = [
        Row(id=1, code="A1", v=5.0),
        Row(id=2, code="B2", v=-1.0),
        Row(id=2, code=None, v=150.0),  # dup id, null code, out of range
        Row(id=4, code="zz", v=50.0),   # regex violation
    ]
    return spark.createDataFrame(rows)


def test_all_rule_kinds_one_report(spark):
    df = _df(spark)
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["violation_frac"])
        for r in check_rules(
            df,
            [
                ("not_null", "code"),
                ("in_range", "v", 0.0, 100.0),
                ("matches", "code", r"^[A-Z][0-9]$"),
                ("non_negative", "v"),
                ("in_set", "code", ["A1", "B2", "zz"]),
                ("unique", "id"),
            ],
        ).collect()
    }
    assert out["not_null(code)"] == (4, 1, 0.25)
    assert out["in_range(v)"] == (4, 2, 0.5)       # -1 and 150
    assert out["matches(code)"] == (4, 2, 0.5)     # null + zz
    assert out["non_negative(v)"] == (4, 1, 0.25)
    assert out["in_set(code)"] == (4, 1, 0.25)     # null only
    assert out["unique(id)"] == (4, 2, 0.5)        # both id=2 rows count


def test_clean_table_zero_violations(spark):
    df = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    out = check_rules(df, [("unique", "id"), ("non_negative", "v")]).collect()
    assert all(r["n_violations"] == 0 for r in out)


def test_single_aggregate_for_row_rules(spark):
    df = _df(spark)
    plan = (
        check_rules(df, [("not_null", "code"), ("non_negative", "v")])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # every row-local rule shares one Aggregate over one scan
    assert plan.count("Aggregate") == 1


def test_unknown_rule_rejected(spark):
    with pytest.raises(ValueError, match="unknown rule"):
        check_rules(_df(spark), [("frobnicate", "id")]).collect()


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="non-empty"):
        check_rules(_df(spark), [])
