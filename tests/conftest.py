"""Shared test fixtures: a local SparkSession and DataFrame helpers."""

from __future__ import annotations

import datetime
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("aces-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def ts(s: str | None) -> datetime.datetime | None:
    """Parse 'YYYY-MM-DD HH:MM[:SS]' into a naive datetime (session TZ=UTC)."""
    if s is None:
        return None
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return datetime.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"Unparseable test timestamp: {s}")


def as_sorted_pdf(df, sort_cols) -> pd.DataFrame:
    """Collect a Spark DataFrame to pandas, sorted, index reset."""
    pdf = df.toPandas()
    return pdf.sort_values(sort_cols).reset_index(drop=True)


def _is_null(x) -> bool:
    if x is None:
        return True
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def assert_frame_matches(actual, expected_rows, columns, sort_cols=("subject_id", "timestamp")):
    """Compare a Spark DataFrame against a list of expected row tuples."""
    expected = pd.DataFrame(expected_rows, columns=columns)
    got = as_sorted_pdf(actual.select(*columns), list(sort_cols))
    expected = expected.sort_values(list(sort_cols)).reset_index(drop=True)
    for col in columns:
        exp_vals = expected[col].tolist()
        got_vals = got[col].tolist()
        assert len(exp_vals) == len(got_vals), (
            f"Row count mismatch: expected {len(exp_vals)}, got {len(got_vals)}\n{got}"
        )
        for i, (e, g) in enumerate(zip(exp_vals, got_vals)):
            e_null = _is_null(e)
            g_null = _is_null(g)
            if e_null or g_null:
                assert e_null and g_null, f"{col}[{i}]: expected {e!r}, got {g!r}\n{got}"
            elif isinstance(e, datetime.datetime):
                assert pd.Timestamp(e) == pd.Timestamp(g), f"{col}[{i}]: expected {e}, got {g}\n{got}"
            else:
                assert e == g, f"{col}[{i}]: expected {e!r}, got {g!r}\n{got}"
