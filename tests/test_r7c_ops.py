"""Round-7 batch C operators: linear-classifier inference, Zipf corpus
stats, epoch sharding, prefix-filtered Jaccard join."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.dedup import ngram_jaccard_pairs, prefix_jaccard_pairs
from aces_spark.datapipe.packing import epoch_shards
from aces_spark.datapipe.text import zipf_stats
from aces_spark.functions.features import feature_hashing, linear_classifier_score


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- classifier


def test_linear_classifier_matches_feature_matrix_dot(spark):
    """score == the dot product of feature_hashing's sparse matrix with
    the weight vector — the train-elsewhere/serve-here contract."""
    docs = spark.createDataFrame(
        [(1, "good clean prose here"), (2, "spam spam spam buy now"), (3, "")],
        ["doc_id", "text"],
    )
    n_buckets = 64
    weights = spark.createDataFrame(
        [(b, (b * 37) % 11 - 5) for b in range(n_buckets)],
        ["bucket", "weight_micro"],
    )
    got = {
        r["doc_id"]: (r["score_micro"], r["label"])
        for r in linear_classifier_score(
            docs, weights, n_buckets=n_buckets, bias_micro=3
        ).collect()
    }
    feats = feature_hashing(docs, n_buckets=n_buckets).collect()
    w = {b: (b * 37) % 11 - 5 for b in range(n_buckets)}
    expect: dict[int, int] = {1: 3, 2: 3, 3: 3}
    for r in feats:
        expect[r["doc_id"]] += r["value"] * w[r["bucket"]]
    for d in (1, 2, 3):
        assert got[d] == (expect[d], expect[d] >= 0), f"doc {d}"


def test_linear_classifier_empty_doc_scores_bias(spark):
    docs = spark.createDataFrame([(1, ""), (2, "   "), (3, None)], ["doc_id", "text"])
    weights = spark.createDataFrame([(0, 100)], ["bucket", "weight_micro"])
    rows = linear_classifier_score(docs, weights, bias_micro=-7).collect()
    assert len(rows) == 3
    assert all(r["score_micro"] == -7 and r["label"] is False for r in rows)


def test_linear_classifier_unsigned_and_sparse_weights(spark):
    """signed=False sums raw weights; buckets missing from the model
    contribute exactly 0."""
    docs = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
    ba = _h60("alpha") % 16
    weights = spark.createDataFrame([(ba, 10)], ["bucket", "weight_micro"])
    hits = [w for w in ("alpha", "beta", "alpha") if _h60(w) % 16 == ba]
    (row,) = linear_classifier_score(
        docs, weights, n_buckets=16, signed=False
    ).collect()
    assert row["score_micro"] == 10 * len(hits)

    (srow,) = linear_classifier_score(docs, weights, n_buckets=16).collect()
    signed_sum = sum(
        (-1 if _h60(w) & (1 << 59) else 1) * 10 for w in hits
    )
    assert srow["score_micro"] == signed_sum


def test_linear_classifier_validation(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    weights = spark.createDataFrame([(0, 1)], ["bucket", "weight_micro"])
    with pytest.raises(ValueError):
        linear_classifier_score(docs, weights, n_buckets=0)


# ---------------------------------------------------------------------- zipf


def test_zipf_stats_hand_computed(spark):
    # term counts: a=4, b=2, c=1 -> ranks 1,2,3
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c a")], ["doc_id", "text"]
    )
    (row,) = zipf_stats(docs, top_n=10).collect()
    assert (row["n_terms"], row["n_tokens"]) == (3, 7)
    assert row["ttr_bp"] == 3 * 10000 // 7

    def lnu(v: float) -> int:
        return math.floor(math.log(v) * 1000000 + 0.5)

    xs = [lnu(r) for r in (1, 2, 3)]
    ys = [lnu(c) for c in (4, 2, 1)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert row["zipf_slope"] == round(num / den, 6)
    assert row["zipf_intercept"] == round((sy - num / den * sx) / n / 1e6, 6)


def test_zipf_stats_degenerate_and_empty(spark):
    (row,) = zipf_stats(
        spark.createDataFrame([(1, "same same")], ["doc_id", "text"]), top_n=5
    ).collect()
    assert (row["n_terms"], row["n_tokens"]) == (1, 2)
    assert row["zipf_slope"] is None  # one rank: no fit

    (empty,) = zipf_stats(
        spark.createDataFrame([(1, "")], ["doc_id", "text"]), top_n=5
    ).collect()
    assert (empty["n_terms"], empty["n_tokens"], empty["ttr_bp"]) == (0, 0, 0)
    assert empty["zipf_slope"] is None

    with pytest.raises(ValueError):
        zipf_stats(spark.createDataFrame([(1, "x")], ["doc_id", "text"]), top_n=1)


# -------------------------------------------------------------- epoch shards


def test_epoch_shards_positions_and_determinism(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    rows = epoch_shards(docs, n_shards=4, epoch=1).collect()
    assert len(rows) == 100
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, members in by_shard.items():
        assert sorted(m["pos"] for m in members) == list(range(len(members)))
        # pos order == (hash, id) order, mirrored in python
        def key(m):
            h = int(
                hashlib.md5(f"1|{m['doc_id']}".encode()).hexdigest()[:15], 16
            )
            return (h, m["doc_id"])

        assert [m["doc_id"] for m in sorted(members, key=lambda m: m["pos"])] == [
            m["doc_id"] for m in sorted(members, key=key)
        ]
        assert all(
            int(hashlib.md5(f"1|{m['doc_id']}".encode()).hexdigest()[:15], 16) % 4
            == shard
            for m in members
        )


def test_epoch_shards_reshuffles_across_epochs(spark):
    docs = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    e0 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in epoch_shards(docs, 8, 0).collect()}
    e1 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in epoch_shards(docs, 8, 1).collect()}
    assert e0 != e1  # a different permutation...
    assert set(e0) == set(e1)  # ...of the same corpus
    with pytest.raises(ValueError):
        epoch_shards(docs, 0)


# ----------------------------------------------------- prefix jaccard pairs


def _jac_corpus(spark):
    # 40 base docs of rotating words + planted near-dup pairs
    words = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        toks = [words[(d * 7 + j * 3) % 30] for j in range(12)]
        rows.append((d, " ".join(toks)))
    # planted: 100 and 101 differ by one trailing word
    rows.append((100, "p q r s t u v w x y"))
    rows.append((101, "p q r s t u v w x z"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prefix_jaccard_equals_inverted_index(spark):
    """The headline differential: PPJoin-filtered output ≡ the full
    inverted-index operator (cap off) at several thresholds."""
    docs = _jac_corpus(spark)
    for t in (0.2, 0.5, 0.8):
        want = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, n=2, threshold=t, max_doc_freq=None
            ).collect()
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in prefix_jaccard_pairs(docs, n=2, threshold=t).collect()
        )
        assert got == want, f"threshold {t}: {got} != {want}"
        spark.catalog.clearCache()


def test_prefix_jaccard_finds_planted_pair(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(_jac_corpus(spark), n=2, threshold=0.7).collect()
    }
    # 9 shared bigrams of 10 each (n=2): J = 8/10? shingles: doc 100 has
    # 9 bigrams, doc 101 has 9, share 8 -> J = 8/10 = 0.8
    assert pairs.get((100, 101)) == pytest.approx(0.8)
    spark.catalog.clearCache()


def test_prefix_jaccard_validation(spark):
    docs = _jac_corpus(spark)
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(docs, threshold=0.01)


# ----------------------------------------------------------- ngram overlap


def test_ngram_overlap_hand_computed(spark):
    from aces_spark.datapipe.text import ngram_overlap_stats

    df = spark.createDataFrame(
        [
            # A bigrams: {a b, b c, c d}; B bigrams: {a b, b x}
            (1, "a b c d", "a b x"),
            (2, "hello", ""),        # empty reference side
            (3, "", ""),             # both empty
            (4, "x y", "x y"),       # identical
        ],
        ["doc_id", "a", "b"],
    )
    got = {
        r["doc_id"]: (
            r["n_grams_a"], r["n_grams_b"], r["n_common"],
            r["precision_bp"], r["recall_bp"], r["f1_bp"],
        )
        for r in ngram_overlap_stats(df, "a", "b", n=2).collect()
    }
    assert got[1] == (3, 2, 1, 10000 // 3, 5000, 2 * 10000 // 5)
    assert got[2] == (0, 0, 0, 0, 0, 0)  # single token -> no bigram
    assert got[3] == (0, 0, 0, 0, 0, 0)
    assert got[4] == (1, 1, 1, 10000, 10000, 10000)


def test_ngram_overlap_unigrams_and_dedup(spark):
    from aces_spark.datapipe.text import ngram_overlap_stats

    df = spark.createDataFrame(
        [(1, "the the the cat", "cat cat dog")], ["doc_id", "a", "b"]
    )
    (r,) = ngram_overlap_stats(df, "a", "b", n=1).collect()
    # distinct sets: A={the,cat}, B={cat,dog}, common={cat}
    assert (r["n_grams_a"], r["n_grams_b"], r["n_common"]) == (2, 2, 1)
    assert r["f1_bp"] == 2 * 10000 // 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        ngram_overlap_stats(df, "a", "b", n=0)
