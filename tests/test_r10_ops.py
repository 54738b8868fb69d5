"""Round-10 operator tests — judge asks from VERDICT r9.

1. ``negative_samples`` auto-switches to the bucketized interval
   equi-join past ``max_broadcast_items`` with IDENTICAL output to the
   broadcast path (judge ask #4): parity pinned with the threshold
   forced below the vocabulary size.
"""

from __future__ import annotations

from aces_spark.datapipe.sampling import negative_samples


def _collect_sorted(df):
    return sorted(
        (r["user_id"], r["item"], r["neg_rank"], r["neg_item"]) for r in df.collect()
    )


def test_negative_samples_bucketized_parity(spark):
    # 40 items, Zipf-ish repetition so the cumulative intervals have
    # very unequal widths (the bucketized path must still route every
    # draw to exactly one containing interval)
    rows = []
    for u in range(60):
        for j in range((u % 7) + 1):
            rows.append((f"u{u}", f"item{(u * 13 + j * j) % 40}"))
    pos = spark.createDataFrame(rows, "user_id string, item string")

    broadcasted = negative_samples(pos, k=3)  # default threshold: broadcast
    bucketized = negative_samples(pos, k=3, max_broadcast_items=10)

    got_b = _collect_sorted(broadcasted)
    got_k = _collect_sorted(bucketized)
    assert len(got_b) == len(rows) * 3  # exactly one negative per draw
    assert got_b == got_k


def test_negative_samples_bucketized_parity_uniform(spark):
    pos = spark.createDataFrame(
        [(f"u{i}", f"it{i % 25}") for i in range(100)],
        "user_id string, item string",
    )
    a = _collect_sorted(negative_samples(pos, k=2, smoothing="uniform"))
    b = _collect_sorted(
        negative_samples(pos, k=2, smoothing="uniform", max_broadcast_items=5)
    )
    assert a == b and len(a) == 200


def test_prefix_jaccard_streamed_blocks_parity(spark):
    # the sf10 streamed runner's block decomposition (judge ask #2) must
    # reproduce the one-shot operator exactly: per-block distinct +
    # verify, then a cross-block distinct
    from pyspark.sql import functions as F

    from aces_spark.datapipe.dedup import (
        _prefix_candidates,
        _prefix_relation,
        _prefix_verify,
        prefix_jaccard_pairs,
        word_shingles,
    )

    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    for i in range(30):
        words = base.split()
        if i % 3 == 0:
            words[i % len(words)] = f"tok{i}"
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    direct = sorted(tuple(r) for r in prefix_jaccard_pairs(docs, n=2, threshold=0.5).collect())
    assert direct, "fixture must produce pairs"

    t_bp = 5000
    sh = word_shingles(docs, 2, "text").select(
        "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
    ).persist()
    prefix = _prefix_relation(sh, t_bp).persist()
    arrs = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("__arr")
    ).persist()
    blocks = 4
    parts = None
    for k in range(blocks):
        pk = prefix.filter(F.pmod(F.col("shingle"), F.lit(blocks)) == k)
        out = _prefix_verify(_prefix_candidates(pk, t_bp).distinct(), arrs, 0.5)
        parts = out if parts is None else parts.union(out)
    streamed = sorted(tuple(r) for r in parts.distinct().collect())
    assert streamed == direct


def test_k_anonymity_report(spark):
    from aces_spark.datapipe.pii import k_anonymity_report

    rows = [("us", "a")] * 6 + [("us", "b")] * 2 + [("fr", "a")] * 5
    df = spark.createDataFrame(rows, "region string, seg string")
    got = {
        (r["region"], r["seg"]): (r["class_n"], r["at_risk"])
        for r in k_anonymity_report(df, ["region", "seg"], k=5).collect()
    }
    assert got == {
        ("us", "a"): (6, False),
        ("us", "b"): (2, True),
        ("fr", "a"): (5, False),
    }
    import pytest

    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=5)


def test_vocab_richness_hand_computed(spark):
    from aces_spark.datapipe.text import vocab_richness

    # tokens: a a a b b c d  → N=7, V=4, f1=2 (c,d), f2=1 (b)
    df = spark.createDataFrame([("a a a b b",), ("c d",)], "text string")
    r = vocab_richness(df).collect()[0]
    assert (r["n_tokens"], r["v_observed"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    # chao1 = 4 + 2*1/(2*2) = 4.5 ; gt_unseen = 2/7 floored at 6dp
    assert r["chao1"] == 4.5
    assert r["gt_unseen"] == 0.285714


def test_robust_outliers_planted(spark):
    from aces_spark.datapipe.analytics import robust_outliers

    vals = [float(v) for v in [10, 11, 12, 13, 14, 9, 10, 12, 11, 500]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "row_id long, v double"
    )
    got = robust_outliers(df, "v", "row_id", n_mads=3).collect()
    # med = 11 (lower median of 10 values), MAD = 1; only 500 exceeds 3
    assert [(r["row_id"], r["v"]) for r in got] == [(9, 500.0)]
    assert got[0]["med"] == 11.0 and got[0]["mad"] == 1.0


def test_excess_loss_zero_for_identical_models(spark):
    from aces_spark.datapipe.lm import excess_loss_scores, train_bigram_lm

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 5}") for i in range(20)],
        "doc_id long, text string",
    )
    model = train_bigram_lm(docs.filter("doc_id % 2 = 0"))
    out = excess_loss_scores(docs.filter("doc_id % 2 = 1"), model, model)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["excess"] == 0.0 and r["nll_ref"] == r["nll_gen"] for r in rows)


def test_seasonality_profile_hand_computed(spark):
    from datetime import datetime

    from aces_spark.operators.timeseries import seasonality_profile

    rows = [
        (datetime(2024, 1, 1, 9, 5), 10.0),
        (datetime(2024, 1, 2, 9, 40), 20.0),
        (datetime(2024, 1, 1, 23, 0), 40.0),
        (datetime(2024, 1, 1, 10, 0), None),  # nulls excluded
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r["bucket"]: r for r in seasonality_profile(df).collect()}
    assert set(got) == {9, 23}
    assert got[9]["n"] == 2 and got[9]["bucket_mean"] == 15.0
    # global mean = 70/3 = 23.333333 (floored); index 9h = 15/23.333333
    assert got[9]["seasonal_index"] == 0.642857
    assert got[23]["seasonal_index"] == 1.714286


def test_seasonality_profile_day_of_week_portable(spark):
    from datetime import datetime

    from aces_spark.operators.timeseries import seasonality_profile

    # 1970-01-01 was a Thursday → bucket 4 with 0 = Sunday
    df = spark.createDataFrame(
        [(datetime(1970, 1, 1, 12), 1.0), (datetime(1970, 1, 4, 1), 3.0)],
        "ts timestamp, value double",
    )
    got = {r["bucket"]: r["n"] for r in seasonality_profile(df, period="day_of_week").collect()}
    assert got == {4: 1, 0: 1}


def test_mutual_knn_pairs_kills_hub(spark):
    import numpy as np

    from aces_spark.datapipe.similarity import mutual_topk_pairs

    # two tight clusters + one hub vector equidistant-ish from both:
    # with k=2 the hub lands in many lists but its own list holds only
    # its 2 nearest — pairs not reciprocated must be dropped
    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.99, 0.14, 0.0],
        3: [0.0, 1.0, 0.0],
        4: [0.14, 0.99, 0.0],
        9: [0.7, 0.7, 0.2],  # hub
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {(r["vec_a"], r["vec_b"]) for r in mutual_topk_pairs(df, k=2).collect()}
    # in-cluster pairs are mutual
    assert (1, 2) in got and (3, 4) in got
    # every emitted pair must be reciprocal by construction: verify
    # against a numpy-ranked reference
    x = {i: np.array(v) / np.linalg.norm(v) for i, v in vecs.items()}
    def knn(i, k=2):
        sims = sorted(
            ((round(float(x[i] @ x[j]), 6), -j) for j in x if j != i), reverse=True
        )
        return {-nj for _, nj in sims[:k]}
    want = {
        (min(a, b), max(a, b))
        for a in x
        for b in knn(a)
        if a in knn(b)
    }
    assert got == want


def test_cusum_scan_matches_recurrence(spark):
    from aces_spark.datapipe.analytics import cusum_scan

    xs = [5.0, 1.0, 9.0, 9.0, 0.0, 0.0, 8.0, 2.0, 2.0, 12.0]
    target, slack = 4.0, 0.5
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "seq int, v double"
    )
    got = {
        r["seq"]: r["cusum_micro"]
        for r in cusum_scan(df, "v", ["seq"], target, slack=slack).collect()
    }
    s, want = 0, []
    for x in xs:
        d = round(x * 1_000_000) - round(target * 1_000_000) - round(slack * 1_000_000)
        s = max(0, s + d)
        want.append(s)
    assert [got[i] for i in range(len(xs))] == want


def test_cusum_scan_grouped_reset(spark):
    from aces_spark.datapipe.analytics import cusum_scan

    rows = [("a", 0, 10.0), ("a", 1, 10.0), ("b", 0, 1.0), ("b", 1, 10.0)]
    df = spark.createDataFrame(rows, "g string, seq int, v double")
    got = {
        (r["g"], r["seq"]): r["cusum_micro"]
        for r in cusum_scan(df, "v", ["seq"], 5.0, group_col="g").collect()
    }
    # group a climbs 5 then 10; group b dips (clamped to 0) then climbs 5
    assert got[("a", 0)] == 5_000_000 and got[("a", 1)] == 10_000_000
    assert got[("b", 0)] == 0 and got[("b", 1)] == 5_000_000


def test_cusum_drift_report(spark):
    from aces_spark.datapipe.analytics import cusum_drift_report

    rows = [("a", i, 6.0) for i in range(5)] + [("quiet", i, 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, seq int, v double")
    got = {
        r["g"]: r
        for r in cusum_drift_report(
            df, "v", ["seq"], target=5.0, threshold=2.5, group_col="g"
        ).collect()
    }
    a = got["a"]
    # s climbs 1,2,3,4,5 -> alarms at s=3,4,5; peak 5.0 at seq 4
    assert (a["n"], a["n_alarms"], a["max_cusum_micro"], a["peak_at"]) == (
        5, 3, 5_000_000, 4,
    )
    q = got["quiet"]
    assert (q["n_alarms"], q["max_cusum_micro"], q["peak_at"]) == (0, 0, 0)
