"""array_lit (functions.litfast) must be value-identical to F.lit for
every shape the engine inlines: centroid matrices, PQ codebooks,
hyperplane tables, id lists, the sigmoid table — including round-trip
floats that only repr() prints exactly — and must fall back to F.lit
for shapes SQL literals cannot spell (empty arrays, non-finite)."""

import math

from pyspark.sql import functions as F

from aces_spark.functions.litfast import array_lit


def _pair(spark, data, **kw):
    row = spark.range(1).select(
        F.lit(data).alias("a"), array_lit(data, **kw).alias("b")
    ).first()
    return row["a"], row["b"]


def test_flat_double_bitexact(spark):
    vals = [0.1, -0.0, 1e-300, 1.5e20, 2.0 / 3.0, -1.2345678901234567]
    a, b = _pair(spark, vals)
    assert [math.copysign(1, x) for x in a] == [math.copysign(1, x) for x in b]
    assert a == b


def test_nested_double_matrix(spark):
    mat = [[i / 7.0 + j * 1e-9 for j in range(8)] for i in range(5)]
    a, b = _pair(spark, mat)
    assert a == b


def test_triple_nested_codebook(spark):
    cb = [[[float(i * 100 + j * 10 + k) / 3.0 for k in range(3)] for j in range(2)] for i in range(2)]
    a, b = _pair(spark, cb)
    assert a == b


def test_int_list_bigint(spark):
    ids = [0, 1, -5, 2**62]
    a, b = _pair(spark, ids)
    assert a == b
    df = spark.range(1).select(array_lit(ids).alias("b"))
    assert df.schema["b"].dataType.simpleString() == "array<bigint>"


def test_empty_and_nonfinite_fall_back(spark):
    # empty → F.lit fallback (same value, whatever type F.lit picks)
    row = spark.range(1).select(array_lit([0.5, float("nan")]).alias("b")).first()
    assert math.isnan(row["b"][1]) and row["b"][0] == 0.5
    inf_row = spark.range(1).select(array_lit([float("inf")]).alias("b")).first()
    assert math.isinf(inf_row["b"][0])


def test_scorer_parity_lsh_planes(spark):
    from aces_spark.datapipe.similarity import _hyperplanes

    hp = _hyperplanes(16, 12, 0)
    a, b = _pair(spark, hp)
    assert a == b
