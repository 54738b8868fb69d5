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


# ---------------------------------------------------------------------------
# substring_strip (VERDICT r7 ask #3)
# ---------------------------------------------------------------------------

import string

from aces_spark.datapipe.dedup import substring_strip


def _strip_corpus(spark, seed=1):
    rng = random.Random(seed)
    boiler = "SUBSCRIBE TO OUR NEWSLETTER NOW FOR FREE UPDATES DAILY! " * 2

    def uniq(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    rows = [
        (0, uniq(100) + boiler + uniq(100)),
        (1, uniq(80) + boiler + uniq(60)),
        (2, uniq(160)),  # clean
        (3, "tiny"),  # < window
        (4, boiler + uniq(20) + boiler),  # two spans in one doc
        (5, ""),  # empty
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_strip_invariants(spark):
    rows, df = _strip_corpus(spark)
    window, stride = 40, 20
    out = {r["doc_id"]: r for r in substring_strip(df, window=window, stride=stride).collect()}
    orig = dict(rows)
    assert set(out) == set(orig)  # every doc survives
    for d, t in orig.items():
        r = out[d]
        # exact length arithmetic
        assert len(r["text_clean"]) == len(t) - r["n_chars_removed"]
        assert (r["n_spans"] == 0) == (r["n_chars_removed"] == 0)
    # untouched docs byte-identical
    assert out[2]["text_clean"] == orig[2] and out[2]["n_spans"] == 0
    assert out[3]["text_clean"] == "tiny" and out[5]["text_clean"] == ""
    # the shared boilerplate was stripped from every carrier
    for d in (0, 1, 4):
        assert out[d]["n_spans"] >= 1


def test_substring_strip_no_flagged_window_survives(spark):
    # recompute the flag set on the ORIGINAL corpus and assert every
    # flagged window's char range falls inside a removed region:
    # reconstruct removed regions from (text, text_clean) via the span
    # arithmetic invariant len(clean) = len(text) - removed, then check
    # each flagged window's exact chars are gone from its document's
    # clean text at any stride-aligned position
    import hashlib

    rows, df = _strip_corpus(spark)
    window, stride = 40, 20
    orig = dict(rows)
    # python reference flag set
    fps = {}
    for d, t in orig.items():
        if len(t) < window:
            continue
        for i in range((len(t) - window) // stride + 1):
            w = t[i * stride : i * stride + window]
            fps.setdefault(hashlib.md5(w.encode()).hexdigest(), []).append((d, i * stride, w))
    flagged = {k: v for k, v in fps.items() if len(v) >= 2}
    out = {r["doc_id"]: r["text_clean"] for r in
           substring_strip(df, window=window, stride=stride).collect()}
    for occs in flagged.values():
        for d, s, w in occs:
            clean = out[d]
            # no stride-aligned window of the clean text equals a flagged one
            for i in range(max(0, (len(clean) - window) // stride + 1)):
                assert clean[i * stride : i * stride + window] != w or len(clean) < window


def test_substring_strip_python_differential(spark):
    # full python reference: same flag -> same islands -> same splice
    import hashlib

    rng = random.Random(9)
    window, stride = 12, 6
    vocab = "abcdef"
    rows = []
    for d in range(30):
        # short alphabet makes genuine cross-doc repeats likely
        rows.append((d, "".join(rng.choice(vocab) for _ in range(rng.randint(0, 80)))))
    orig = dict(rows)
    counts = {}
    wins = {}
    for d, t in orig.items():
        if len(t) < window:
            continue
        for i in range((len(t) - window) // stride + 1):
            fp = hashlib.md5(t[i * stride : i * stride + window].encode()).hexdigest()
            counts[fp] = counts.get(fp, 0) + 1
            wins.setdefault(d, []).append((i * stride, i * stride + window, fp))
    expect = {}
    for d, t in orig.items():
        spans = []
        for s, e, fp in wins.get(d, []):
            if counts[fp] < 2:
                continue
            if spans and s <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        clean, prev = "", 0
        for s, e in spans:
            clean += t[prev:s]
            prev = e
        clean += t[prev:]
        expect[d] = (clean, len(spans), sum(e - s for s, e in spans))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_spans"], r["n_chars_removed"])
           for r in substring_strip(df, window=window, stride=stride).collect()}
    assert got == expect


def test_substring_strip_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_strip(df, window=0)
    with pytest.raises(ValueError):
        substring_strip(df, stride=0)
