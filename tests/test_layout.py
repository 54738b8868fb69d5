"""Tests for sources/layout.py: Z-order (Morton) data layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.sources.layout import (
    quantize,
    zorder_bucket_stats,
    zorder_key,
    zorder_layout,
)


def _morton(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_key_matches_python_morton(spark):
    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton((r["x"], r["y"]), 8), (r["x"], r["y"])


def test_zorder_key_three_dims(spark):
    df = spark.createDataFrame([(3, 5, 7)], "a long, b long, c long")
    z = df.select(
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]["z"]
    assert z == _morton((3, 5, 7), 4)


def test_zorder_key_validates(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("a")], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)  # 64 bits > 62


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-10.0,), (0.0,), (50.0,), (100.0,), (999.0,)], "v double"
    )
    got = [
        r[0]
        for r in df.select(quantize(F.col("v"), 0.0, 100.0, bits=8)).collect()
    ]
    assert got[0] == 0  # clamped low
    assert got[1] == 0
    assert got[2] == 128  # floor(0.5*255 + 0.5)
    assert got[3] == 255
    assert got[4] == 255  # clamped high
    with pytest.raises(ValueError):
        quantize(F.col("v"), 5.0, 5.0)


def test_zorder_layout_sorts_by_morton_within_partitions(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    out = zorder_layout(df, [F.col("x"), F.col("y")], bits=4, num_files=2)
    assert set(out.columns) == {"x", "y"}  # helper column dropped
    parts = out.withColumn(
        "z", zorder_key([F.col("x"), F.col("y")], bits=4)
    ).select(F.spark_partition_id().alias("p"), "z").collect()
    by_part = {}
    for r in parts:
        by_part.setdefault(r["p"], []).append(r["z"])
    for zs in by_part.values():
        assert zs == sorted(zs)


def test_zorder_bucket_stats_ranges_are_tight(spark):
    # full 256x256 grid: every 2^10-z bucket spans a 32x32 tile, so each
    # dim range inside a bucket is exactly 31
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 256, 4) for y in range(0, 256, 4)],
        "x long, y long",
    )
    stats = zorder_bucket_stats(
        df, [F.col("x"), F.col("y")], ["x", "y"], bits=8, bucket_shift=10
    ).collect()
    assert len(stats) == 64
    for r in stats:
        assert r["max_x"] - r["min_x"] <= 31
        assert r["max_y"] - r["min_y"] <= 31
    assert sum(r["n_rows"] for r in stats) == 64 * 64


def test_zorder_bucket_stats_validates(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_bucket_stats(df, [F.col("x"), F.col("y")], ["x"])
