"""Tests for operators/bloom.py: bloom-filter semi-join reduction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.operators.bloom import bloom_build, bloom_join, bloom_semi_filter


@pytest.fixture()
def sides(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 30).select(
        (F.col("id") * 11).alias("k"), (F.col("id") + 1000).alias("w")
    )
    return big, small


def test_bloom_join_matches_plain_inner_join(spark, sides):
    big, small = sides
    got = sorted(bloom_join(big, small, "k").collect())
    want = sorted(big.join(small, "k").collect())
    assert got == want
    assert len(got) > 0


def test_bloom_join_leftsemi_parity(spark, sides):
    big, small = sides
    got = sorted(bloom_join(big, small, "k", how="leftsemi").collect())
    want = sorted(big.join(small, "k", "leftsemi").collect())
    assert got == want


def test_bloom_semi_filter_never_false_negative(spark, sides):
    big, small = sides
    words = bloom_build(small, "k")
    kept = {r["k"] for r in bloom_semi_filter(big, "k", words).collect()}
    true_keys = {r["k"] for r in small.collect()} & {
        r["k"] for r in big.collect()
    }
    assert true_keys <= kept  # every real match survives the prefilter


def test_bloom_prunes_most_nonmatching_rows(spark, sides):
    big, small = sides
    words = bloom_build(small, "k")
    pruned_n = bloom_semi_filter(big, "k", words).count()
    true_n = big.join(small.select("k").distinct(), "k", "leftsemi").count()
    # default sizing (2^16 bits, k=2) on 30 keys: fpp well under 1%
    assert true_n <= pruned_n <= true_n + 0.01 * big.count()


def test_bloom_handles_null_keys_like_inner_join(spark):
    big = spark.createDataFrame([(1, "a"), (None, "b"), (2, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (None, "y")], "k int, w string")
    got = sorted(bloom_join(big, small, "k").collect())
    want = sorted(big.join(small, "k").collect())
    assert got == want  # null keys never match in either path


def test_bloom_empty_small_side_yields_empty(spark, sides):
    big, _ = sides
    empty = spark.createDataFrame([], "k long, w long")
    assert bloom_join(big, empty, "k").count() == 0


def test_bloom_build_word_table_is_bounded(spark, sides):
    _, small = sides
    words = bloom_build(small, "k", num_bits=1 << 10)
    assert words.count() <= (1 << 10) // 64
    cols = dict(words.dtypes)
    assert cols == {"word_idx": "int", "bits": "bigint"}


def test_bloom_validates_args(spark, sides):
    big, small = sides
    with pytest.raises(ValueError):
        bloom_build(small, "k", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(small, "k", num_hashes=0)
    with pytest.raises(ValueError):
        bloom_join(big, small, "k", how="left")  # outer joins lose parity


def test_bloom_join_plan_broadcasts_and_avoids_cartesian(spark, sides):
    big, small = sides
    plan = (
        bloom_join(big, small, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # word-table probes broadcast
