"""Round-8 operator tests.

``train_linear_classifier`` — the in-engine half of the CCNet/fastText
quality-classifier loop (VERDICT r7 ask #1): train on a planted
linearly-separable corpus, serve through ``linear_classifier_score``,
and pin accuracy, determinism, and the (bucket, weight_micro) contract.
"""

from __future__ import annotations

import random

import pytest
import pyspark.sql.functions as F

from aces_spark.functions.features import (
    linear_classifier_score,
    sigmoid_table_micro,
    train_linear_classifier,
)

POS = ["good", "great", "excellent", "wonderful", "superb", "fine"]
NEG = ["bad", "awful", "terrible", "dreadful", "poor", "nasty"]
FILLER = ["the", "a", "data", "row", "table", "query", "spark", "join"]


def _planted_corpus(spark, n=200, seed=42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2 == 0
        vocab = POS if y else NEG
        words = [rng.choice(vocab) for _ in range(5)] + [
            rng.choice(FILLER) for _ in range(10)
        ]
        rng.shuffle(words)
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_train_separable_corpus_roundtrip_accuracy(spark):
    docs = _planted_corpus(spark)
    w = train_linear_classifier(docs, n_buckets=1024, n_iters=3)
    assert w.columns == ["bucket", "weight_micro"]
    rows = w.collect()
    assert 0 < len(rows) <= 1024
    assert all(r["weight_micro"] != 0 for r in rows)
    scored = linear_classifier_score(docs.select("doc_id", "text"), w, n_buckets=1024)
    joined = scored.join(
        docs.select("doc_id", F.col("label").alias("truth")), "doc_id"
    )
    n_right = joined.filter(F.col("label") == F.col("truth")).count()
    assert n_right == 200  # pinned: 3 iterations fully separate the plant


def test_train_bit_identical_across_partitioning(spark):
    docs = _planted_corpus(spark, n=80)
    w1 = train_linear_classifier(docs.repartition(1), n_buckets=256, n_iters=2)
    w2 = train_linear_classifier(docs.repartition(7), n_buckets=256, n_iters=2)
    a = sorted((r["bucket"], r["weight_micro"]) for r in w1.collect())
    b = sorted((r["bucket"], r["weight_micro"]) for r in w2.collect())
    assert a == b and a


def test_train_signal_direction(spark):
    # positive-class words must end up in positive-dot buckets: a doc of
    # only POS words scores >= 0, only NEG words scores < 0
    docs = _planted_corpus(spark)
    w = train_linear_classifier(docs, n_buckets=1024, n_iters=3)
    probe = spark.createDataFrame(
        [(0, " ".join(POS)), (1, " ".join(NEG))], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["label"] for r in
           linear_classifier_score(probe, w, n_buckets=1024).collect()}
    assert got == {0: True, 1: False}


def test_train_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label boolean")
    w = train_linear_classifier(empty)
    assert w.count() == 0 and w.columns == ["bucket", "weight_micro"]
    docs = _planted_corpus(spark, n=4)
    with pytest.raises(ValueError):
        train_linear_classifier(docs, n_buckets=0)
    with pytest.raises(ValueError):
        train_linear_classifier(docs, n_iters=0)


def test_sigmoid_table_contract():
    t = sigmoid_table_micro()
    assert len(t) == 256
    assert t[0] < 1000 and t[255] > 999000  # saturates near 0 / 1
    assert t == sorted(t)  # monotone
    assert t[127] + t[128] == 1_000_000  # symmetric around the midpoint
