"""Round-8 ADVICE regression tests.

Pins the four advisor findings fixed this round:

1. ``corpus_diversity`` per-dim Σu² accumulates in DECIMAL, not long —
   a dimension with enough rows (long wrap at ~1e7 rows × 1e12 per-row
   u²) can no longer silently overflow in non-ANSI mode.
2. ``save_lm``/``load_lm`` family marker — re-saving an add-one model
   over a path that previously held a Kneser-Ney model must NOT load a
   mixed model from the stale KN frames.
3. ``leakage_safe_splits(id_col=...)`` returns the caller's id column
   name, not a hard-aliased ``doc_id``.
4. ``prefix_jaccard_pairs`` docstring qualifies exactness as modulo
   64-bit shingle-hash collisions (doc-contract check).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from aces_spark.datapipe.dedup import prefix_jaccard_pairs
from aces_spark.datapipe.lm import load_lm, save_lm, train_bigram_lm, train_kn_lm
from aces_spark.datapipe.packing import leakage_safe_splits
from aces_spark.datapipe.similarity import corpus_diversity


def test_corpus_diversity_decimal_sum_no_long_wrap(spark):
    # Identical max-magnitude unit vectors: every u = 1e6 micro-units on
    # dim 0, so per-dim Σu² = n·1e12. With n rows the long path wraps at
    # n ≈ 9.2e6; we can't build 1e7 rows in a unit test, so instead pin
    # the PLAN: the Σu² aggregate input must be DECIMAL, not LongType.
    df = spark.createDataFrame([([1.0, 0.0],)], "embedding array<double>")
    plan = corpus_diversity(df)._jdf.queryExecution().optimizedPlan().toString()
    # the u² product must be decimal-typed before aggregation
    assert "cast(__u" in plan and "decimal(19,0)" in plan, plan
    # and the correctness at small n still holds: two identical vectors
    # → mean pairwise cosine exactly 1
    df2 = spark.createDataFrame(
        [([3.0, 4.0],), ([3.0, 4.0],)], "embedding array<double>"
    )
    row = corpus_diversity(df2).head()
    assert row["n_vectors"] == 2
    assert math.isclose(row["mean_pairwise_cosine"], 1.0, abs_tol=1e-6)


def test_save_lm_family_marker_prevents_mixed_model(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm")
    kn = train_kn_lm(docs)
    save_lm(kn, path)
    loaded_kn = load_lm(spark, path)
    assert set(loaded_kn) == {"bigrams", "contexts", "continuations", "totals"}

    # Overwrite the SAME path with an add-one model: stale KN frames
    # remain on disk, but the marker must route load_lm to the add-one
    # frame set — never a mixed model.
    addone = train_bigram_lm(docs)
    save_lm(addone, path)
    loaded = load_lm(spark, path)
    assert set(loaded) == {"bigrams", "unigrams", "vocab"}, sorted(loaded)

    # and the reverse direction: KN over a stale add-one save
    save_lm(kn, path)
    loaded2 = load_lm(spark, path)
    assert set(loaded2) == {"bigrams", "contexts", "continuations", "totals"}


def test_load_lm_pre_marker_fallback(spark, tmp_path):
    # A save layout WITHOUT the marker (pre-fix writer) still loads via
    # frame-presence detection.
    docs = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    path = str(tmp_path / "lm_old")
    model = train_bigram_lm(docs)
    for name in ("bigrams", "unigrams", "vocab"):
        model[name].write.mode("overwrite").parquet(f"{path}/{name}")
    loaded = load_lm(spark, path)
    assert set(loaded) == {"bigrams", "unigrams", "vocab"}


def test_leakage_safe_splits_honors_id_col(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "vec_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    out = leakage_safe_splits(docs, pairs, id_col="vec_id")
    assert "vec_id" in out.columns and "doc_id" not in out.columns, out.columns
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 8
    # the 0-1-2 chain is one cluster assigned as a unit
    assert len({rows[i]["split"] for i in (0, 1, 2)}) == 1
    assert rows[0]["cluster_size"] == 3 and rows[5]["cluster_size"] == 1


def test_prefix_jaccard_docstring_qualifies_hash_exactness():
    doc = prefix_jaccard_pairs.__doc__
    assert "collision" in doc and "xxhash64" in doc
