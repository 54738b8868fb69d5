"""Round-9 ADVICE regression tests.

Pins the four r8 advisor findings fixed this round:

1. ``embedding_covariance`` derives the int64 Gram chunk size from the
   batch's observed max |u| (rows × umax² ≤ 2^62), so large-magnitude
   coordinates (|x| up to ~2147) stay exact instead of silently
   wrapping int64 inside an 8192-row chunk.
2. ``pca_whiten`` wraps every inlined literal in ``float(...)`` so
   numpy ≥ 2.0's ``np.float64(...)`` repr can never reach ``F.expr``.
3. ``ab_welch_ttest`` excludes variants with n < 2 from pairing — a
   single-observation variant yields zero rows, never NULL statistics.
4. ``_require_nonempty_totals`` memoizes on the totals DataFrame via a
   WeakSet — the caller's model dict is never mutated, so iterating
   ``model.values()`` sees only DataFrames.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from aces_spark.datapipe.analytics import ab_welch_ttest
from aces_spark.datapipe.lm import score_documents_kn, train_kn_lm
from aces_spark.datapipe.pca import _safe_chunk_rows, embedding_covariance, pca_whiten


def test_covariance_exact_at_extreme_magnitude(spark):
    # |x| = 100 → |u| = 1e8 → u² = 1e16: 8192 rows/chunk would sum to
    # ~8.2e19 > int64. The derived chunk (≤ 46 rows here) must keep the
    # Gram exact — pin against a numpy object-int reference.
    rng = np.random.default_rng(7)
    n, d = 2000, 3
    x = rng.uniform(-100.0, 100.0, size=(n, d))
    u = np.floor(x * 1_000_000 + 0.5).astype(np.int64).astype(object)  # exact big ints
    gram = u.T @ u
    sums = u.sum(axis=0)

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    rows = {(r["i"], r["j"]): r for r in embedding_covariance(df).collect()}
    for i in range(d):
        for j in range(i, d):
            r = rows[(i + 1, j + 1)]
            assert r["n"] == n
            assert r["sum_ui"] == int(sums[i])
            assert r["sum_uj"] == int(sums[j])
            assert r["sum_uiuj"] == int(gram[i, j]), (i, j)


def test_covariance_rejects_int64_unsafe_magnitude(spark):
    # a single coordinate beyond ~2147 would wrap int64 in ONE product
    df = spark.createDataFrame(
        [(0, [5000.0, 0.0])], "vec_id long, embedding array<double>"
    )
    try:
        embedding_covariance(df).collect()
    except Exception as e:  # Py4J wraps the executor-side ValueError
        assert "int64-exact range" in str(e)
    else:
        raise AssertionError("expected magnitude rejection")


def test_safe_chunk_rows_budget():
    budget = 1 << 62
    for umax in (1, 1_000_000, 100_000_000, 2_000_000_000):
        step = _safe_chunk_rows(umax)
        assert step >= 1
        assert step <= 8192
        if umax > 1 and step < 8192:
            assert step * umax * umax <= budget
            assert (step + 1) * umax * umax > budget


def test_pca_whiten_literals_are_plain_floats(spark):
    # the generated SQL must never contain a numpy scalar repr
    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    out = pca_whiten(df, n_components=2)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "np.float64" not in plan
    # and the projection still whitens: covariance of output ≈ I
    w = np.array([r["whitened"] for r in out.collect()])
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(2), atol=1e-4), cov


def test_welch_single_observation_variant_drops_pair(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 9.0)],
        "variant string, value double",
    )
    assert ab_welch_ttest(df).count() == 0  # no NULL-stat row


def test_welch_multi_variant_skips_only_degenerate(spark):
    rows = [("a", float(v)) for v in (1, 2, 3)]
    rows += [("b", float(v)) for v in (4, 6)]
    rows += [("c", 99.0)]  # single observation → excluded
    df = spark.createDataFrame(rows, "variant string, value double")
    got = {(r["variant_a"], r["variant_b"]) for r in ab_welch_ttest(df).collect()}
    assert got == {("a", "b")}


def test_lm_validation_does_not_mutate_model(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        "doc_id long, text string",
    )
    model = train_kn_lm(docs)
    keys_before = set(model.keys())
    score_documents_kn(docs, model).collect()
    score_documents_kn(docs, model).collect()  # memoized second pass
    assert set(model.keys()) == keys_before
    assert all(isinstance(v, DataFrame) for v in model.values())
