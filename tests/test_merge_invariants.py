"""Property-based tests for the mergeable-state family: for every
sketch/state, merge(partial(A), partial(B)) must equal partial(A ∪ B)
for ANY split of the input — the invariant that makes incremental
pipelines safe at all.

Hypothesis drives the data and the split; the assertion is exact
equality of the state tables (they are integer/exact by design).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aces_spark.datapipe.incremental import merge_partials, partial_stats
from aces_spark.datapipe.sketches import (
    cms_merge,
    cms_registers,
    hist_merge,
    hist_registers,
    hll_merge,
    hll_registers,
)

_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.one_of(
            st.none(),
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
        ),
    ),
    min_size=1,
    max_size=40,
)
_pivot = st.integers(min_value=0, max_value=39)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _table(df):
    return sorted(map(tuple, df.collect()))


@given(rows=_rows, pivot=_pivot)
@settings(**_SETTINGS)
def test_cms_merge_invariant_any_split(spark, rows, pivot):
    df = spark.createDataFrame(rows, "k string, v float").withColumn(
        "i", F.monotonically_increasing_id()
    )
    a = df.filter(F.col("i") % 40 < pivot).drop("i")
    b = df.filter(F.col("i") % 40 >= pivot).drop("i")
    whole = cms_registers(df.drop("i"), "k", depth=2, width=64)
    merged = cms_merge(
        cms_registers(a, "k", depth=2, width=64),
        cms_registers(b, "k", depth=2, width=64),
    )
    assert _table(merged) == _table(whole)


@given(rows=_rows, pivot=_pivot)
@settings(**_SETTINGS)
def test_hist_merge_invariant_any_split(spark, rows, pivot):
    df = spark.createDataFrame(rows, "k string, v float").withColumn(
        "i", F.monotonically_increasing_id()
    )
    a = df.filter(F.col("i") % 40 < pivot).drop("i")
    b = df.filter(F.col("i") % 40 >= pivot).drop("i")
    kw = dict(lo=-100.0, hi=100.0, buckets=32)
    whole = hist_registers(df.drop("i"), "v", **kw)
    merged = hist_merge(
        hist_registers(a, "v", **kw), hist_registers(b, "v", **kw)
    )
    assert _table(merged) == _table(whole)


@given(rows=_rows, pivot=_pivot)
@settings(**_SETTINGS)
def test_hll_register_merge_invariant_any_split(spark, rows, pivot):
    df = spark.createDataFrame(rows, "k string, v float").withColumn(
        "i", F.monotonically_increasing_id()
    )
    a = df.filter(F.col("i") % 40 < pivot).drop("i")
    b = df.filter(F.col("i") % 40 >= pivot).drop("i")
    whole = hll_registers(df.drop("i"), "k", p=4)
    ra = hll_registers(a, "k", p=4)
    rb = hll_registers(b, "k", p=4)
    merged = (
        ra.unionByName(rb)
        .groupBy("register")
        .agg(F.max("max_rank").cast("int").alias("max_rank"))
    )
    assert _table(merged) == _table(whole)
    # and the finalized estimates agree too
    est_m = hll_merge(ra, rb, p=4).collect()[0]["estimate"]
    est_w = hll_merge(whole, p=4).collect()[0]["estimate"]
    assert est_m == est_w


@given(rows=_rows, pivot=_pivot)
@settings(**_SETTINGS)
def test_incremental_stats_merge_invariant_any_split(spark, rows, pivot):
    df = spark.createDataFrame(rows, "k string, v float").withColumn(
        "v", F.col("v").cast("double")
    ).withColumn("i", F.monotonically_increasing_id())
    a = df.filter(F.col("i") % 40 < pivot).drop("i")
    b = df.filter(F.col("i") % 40 >= pivot).drop("i")
    whole = partial_stats(df.drop("i"), ["k"], "v")
    merged = merge_partials(
        [partial_stats(a, ["k"], "v"), partial_stats(b, ["k"], "v")]
    )
    assert _table(merged) == _table(whole)


def test_merge_family_smoke(spark):
    """Non-hypothesis fallback so the file always exercises something
    even under -k filters."""
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", None)], "k string, v double"
    )
    assert cms_registers(df, "k").count() > 0
    assert hist_registers(df, "v", lo=0.0, hi=10.0).count() > 0
