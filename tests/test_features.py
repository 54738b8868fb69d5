"""ML feature engineering over cohort output (functions/features.py)."""

from __future__ import annotations

import datetime

import pytest

from aces_spark.config import (
    EventConfig,
    PlainPredicateConfig,
    TaskExtractorConfig,
    WindowConfig,
)
from aces_spark.functions.features import (
    assemble_feature_vectors,
    cohort_feature_vectors,
    flatten_window_summaries,
    mllib_minhash_dup_pairs,
    tfidf_exact,
    tfidf_features,
)
from aces_spark.query import query
from aces_spark.sources.predicates import plain_predicates_from_meds_df

DT = datetime.datetime


@pytest.fixture(scope="module")
def cohort_result(spark):
    meds = spark.createDataFrame(
        [
            (1, DT(2020, 1, 1, 0), "signup", None),
            (1, DT(2020, 1, 1, 6), "click", 10.0),
            (1, DT(2020, 1, 1, 12), "purchase", 99.0),
            (2, DT(2020, 2, 1, 0), "signup", None),
            (2, DT(2020, 2, 1, 1), "click", 5.0),
            (2, DT(2020, 2, 1, 2), "click", 7.0),
        ],
        "subject_id long, timestamp timestamp, code string, numeric_value float",
    )
    preds = {p: PlainPredicateConfig(p) for p in ("signup", "click", "purchase")}
    cfg = TaskExtractorConfig(
        predicates=preds,
        trigger=EventConfig("signup"),
        windows={
            "obs": WindowConfig(
                start="trigger",
                end="start + 24h",
                start_inclusive=True,
                end_inclusive=True,
                has={"click": "(1, None)"},
                label="purchase",
            )
        },
    )
    pred_df = plain_predicates_from_meds_df(meds, preds)
    return query(cfg, pred_df)


def test_flatten_window_summaries(cohort_result):
    flat = flatten_window_summaries(cohort_result)
    assert "obs_end__click" in flat.columns
    assert "obs_end__duration_s" in flat.columns
    assert "obs.end_summary" not in flat.columns
    rows = {r.subject_id: r for r in flat.collect()}
    assert rows[1].obs_end__click == 1 and rows[1].obs_end__purchase == 1
    assert rows[2].obs_end__click == 2 and rows[2].obs_end__purchase == 0
    assert rows[1].obs_end__duration_s == 24 * 3600.0


def test_assemble_and_cohort_vectors(cohort_result):
    vec = cohort_feature_vectors(cohort_result)
    assert set(vec.columns) == {"subject_id", "trigger", "label", "features"}
    rows = {r.subject_id: r for r in vec.collect()}
    # features = [obs_end__signup, obs_end__click, obs_end__purchase, obs_end__duration_s]
    assert list(rows[1].features) == [1.0, 1.0, 1.0, 86400.0]
    assert list(rows[2].features) == [1.0, 2.0, 0.0, 86400.0]
    assert rows[1].label == 1 and rows[2].label == 0

    flat = flatten_window_summaries(cohort_result)
    explicit = assemble_feature_vectors(flat, feature_cols=["obs_end__click"])
    assert [list(r.features) for r in explicit.orderBy("subject_id").collect()] == [[1.0], [2.0]]


def test_tfidf_features(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "entirely different words")],
        "doc_id long, text string",
    )
    out = tfidf_features(docs, num_features=64)
    rows = {r.doc_id: r.tfidf for r in out.collect()}
    assert len(rows) == 3
    # shared terms ("the", "sat") get lower IDF weight than unique ones
    assert rows[1].numNonzeros() == 3
    # docs 1 and 2 share dimensions; doc 3 shares none with doc 1
    d1 = dict(zip(rows[1].indices.tolist(), rows[1].values.tolist()))
    d2 = dict(zip(rows[2].indices.tolist(), rows[2].values.tolist()))
    d3 = dict(zip(rows[3].indices.tolist(), rows[3].values.tolist()))
    assert set(d1) & set(d2)
    assert not set(d1) & set(d3)


def test_tfidf_exact_values(spark):
    """tfidf_exact reproduces MLlib's idf formula ln((N+1)/(df+1)) with
    collision-free terms — hand-checkable on a 3-doc corpus."""
    import math

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "Entirely different words!")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf_exact(docs).collect()}
    # "the": df=2, N=3 → idf = ln(4/3)
    assert out[(1, "the")] == (1, round(math.log(4 / 3), 6))
    # "cat": df=1 → idf = ln(4/2)
    assert out[(1, "cat")] == (1, round(math.log(2.0), 6))
    # normalization: punctuation stripped, lowercased
    assert (3, "entirely") in out and (3, "Entirely") not in out
    assert len([k for k in out if k[0] == 3]) == 3


def test_mllib_minhash_dup_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark window functions"),
        ],
        "doc_id long, text string",
    )
    pairs = mllib_minhash_dup_pairs(docs, threshold=0.8, num_hash_tables=16)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_rank_normalize_basis_points(spark):
    from pyspark.sql import functions as F

    from aces_spark.functions.features import rank_normalize

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 40.0), ("a", 5, 50.0),
        ("b", 6, 7.0),                                   # singleton -> 0
        ("c", 7, 1.0), ("c", 8, 2.0),
    ]
    df = spark.createDataFrame(rows, "grp string, rid long, v double")
    got = {r["rid"]: r["pct_bp"] for r in rank_normalize(df, "grp", "v").collect()}
    # group a, n=5: ranks 1,2,2,4,5 -> (rk-1)*10000 div 4
    assert got[1] == 0 and got[2] == 2500 and got[3] == 2500
    assert got[4] == 7500 and got[5] == 10000
    assert got[6] == 0
    assert got[7] == 0 and got[8] == 10000
