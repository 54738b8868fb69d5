"""Round-5 operators: BM25 retrieval, portable distinct sketches,
event transitions, distribution drift, and rolling window stats."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from conftest import ts


# ------------------------------------------------------------------ BM25

@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick quick quick fox"),
            (3, "a slow green turtle crawls under a log"),
            (4, "fox and dog play in the yard with another dog"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_bm25_scores_basic(corpus):
    from aces_spark.datapipe.retrieval import bm25_scores

    out = {r["doc_id"]: r for r in bm25_scores(corpus, ["fox", "dog"]).collect()}
    # doc 3 and the empty doc match nothing
    assert set(out) == {1, 2, 4}
    assert out[1]["n_matched_terms"] == 2
    assert out[2]["n_matched_terms"] == 1
    assert out[4]["n_matched_terms"] == 2
    # "dog" appears twice in the shortest matching doc context → doc 4
    # outranks doc 1 (one occurrence each of fox+dog in a longer doc)
    assert out[4]["score"] > out[1]["score"]
    # every score is a micro-unit multiple (integer-exact summation)
    for r in out.values():
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-6


def test_bm25_reference_value(corpus):
    """One hand-computed score pins the formula (Lucene idf variant)."""
    from aces_spark.datapipe.retrieval import bm25_scores

    out = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["turtle"]).collect()}
    # stats over docs WITH tokens: N=4, avgdl=(9+4+8+10)/4=7.75; df=1, tf=1, dl=8
    n_docs, avgdl, dl, tf, k1, b = 4, 7.75, 8, 1, 1.2, 0.75
    idf = math.log(1 + (n_docs - 1 + 0.5) / (1 + 0.5))
    expected = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert out == {3: math.floor(expected * 1e6 + 0.5) / 1e6}


def test_bm25_top_k_and_validation(corpus):
    from aces_spark.datapipe.retrieval import bm25_scores

    top = bm25_scores(corpus, ["fox", "dog"], top_k=2).collect()
    assert len(top) == 2
    assert top[0]["score"] >= top[1]["score"]
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(corpus, [])


# --------------------------------------------------------------- sketches

def test_kmv_exact_below_k(spark):
    from aces_spark.datapipe.sketches import kmv_distinct

    df = spark.range(0, 50).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    # fewer than k distinct values → the sketch IS the exact count
    assert row["n_hashes"] == 50 and row["estimate"] == 50.0


def test_kmv_estimate_accuracy_and_dup_invariance(spark):
    from aces_spark.datapipe.sketches import kmv_distinct

    df = spark.range(0, 20000).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["estimate"] == pytest.approx(20000, rel=0.15)
    # duplicates must not move the estimate (distinct hashes drive it)
    dup = df.union(df).union(df)
    assert kmv_distinct(dup, "v", k=256).collect()[0]["estimate"] == row["estimate"]


def test_hll_estimate_accuracy_and_determinism(spark):
    from aces_spark.datapipe.sketches import hll_distinct

    df = spark.range(0, 20000).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", p=9).collect()[0]
    assert row["m"] == 512
    # 1.04/sqrt(512) ≈ 4.6% standard error; allow 3 sigma
    assert row["estimate"] == pytest.approx(20000, rel=0.15)
    # repartition → different partial-aggregation order → SAME estimate
    # (the integer-scaled harmonic sum is order-independent)
    again = hll_distinct(df.repartition(13), "v", p=9).collect()[0]
    assert again["estimate"] == row["estimate"]


def test_hll_small_range_linear_counting(spark):
    from aces_spark.datapipe.sketches import hll_distinct

    df = spark.range(0, 30).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", p=9).collect()[0]
    # 30 << 2.5m → linear-counting branch; near-exact in this regime
    assert row["estimate"] == pytest.approx(30, abs=3)
    with pytest.raises(ValueError, match="p must be"):
        hll_distinct(df, "v", p=2)


# ------------------------------------------------------- event transitions

def test_event_transitions(spark):
    from aces_spark.datapipe.analytics import event_transitions

    rows = [
        (1, "view", ts("2024-01-01 10:00"), 1),
        (1, "click", ts("2024-01-01 10:01"), 2),
        (1, "purchase", ts("2024-01-01 10:02"), 3),
        (2, "view", ts("2024-01-01 11:00"), 4),
        (2, "click", ts("2024-01-01 11:01"), 5),
        (2, "view", ts("2024-01-01 11:02"), 6),
        # same-ts tie broken by event_id: view(7) -> click(8)
        (3, "view", ts("2024-01-01 12:00"), 7),
        (3, "click", ts("2024-01-01 12:00"), 8),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in event_transitions(df).collect()
    }
    assert out[("view", "click")] == (3, 1.0)
    assert out[("click", "purchase")] == (1, 0.5)
    assert out[("click", "view")] == (1, 0.5)
    # last event per user emits no transition
    assert sum(n for n, _ in out.values()) == 5


# ------------------------------------------------------ distribution drift

def test_distribution_drift(spark):
    from aces_spark.datapipe.analytics import distribution_drift

    old = spark.createDataFrame([("en",)] * 8 + [("de",)] * 2, "lang string")
    new = spark.createDataFrame([("en",)] * 5 + [("fr",)] * 5, "lang string")
    out = {r["value"]: r for r in distribution_drift(old, new, "lang").collect()}
    assert set(out) == {"en", "de", "fr"}
    # Laplace smoothing: p_old(fr) = (0+1)/(10+3) — present despite 0 count
    assert out["fr"]["n_old"] == 0
    assert out["fr"]["p_old"] == math.floor(1 / 13 * 1e6 + 0.5) / 1e6
    # KL terms: positive where new over-represents, negative where under
    assert out["fr"]["kl_term"] > 0 and out["de"]["kl_term"] < 0
    with pytest.raises(ValueError, match="smoothing"):
        distribution_drift(old, new, "lang", smoothing=0)


# --------------------------------------------------------- rolling stats

def test_rolling_stats(spark):
    from aces_spark.operators.timeseries import rolling_stats

    rows = [
        (1, ts("2024-01-01 10:00"), 10.0, 1),
        (1, ts("2024-01-01 10:01"), 20.0, 2),
        (1, ts("2024-01-01 10:02"), 60.0, 3),
        (1, ts("2024-01-01 10:03"), None, 4),
        (2, ts("2024-01-01 10:00"), 5.0, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = {
        r["event_id"]: r for r in rolling_stats(df, "user_id", window_rows=3).collect()
    }
    assert out[1]["roll_n"] == 1 and out[1]["roll_mean"] == 10.0
    assert out[2]["roll_n"] == 2 and out[2]["roll_mean"] == 15.0
    assert out[3]["roll_n"] == 3 and out[3]["roll_mean"] == 30.0
    assert out[3]["roll_min"] == 10.0 and out[3]["roll_max"] == 60.0
    # null value: occupies frame position, excluded from the aggregates
    assert out[4]["roll_n"] == 2 and out[4]["roll_sum"] == 80.0
    assert out[4]["roll_mean"] == 40.0
    assert out[5]["roll_n"] == 1 and out[5]["roll_mean"] == 5.0
    with pytest.raises(ValueError, match="window_rows"):
        rolling_stats(df, "user_id", window_rows=0)


def test_rolling_stats_partition_invariance(spark):
    """Decimal sums + floor rule: the same result at any parallelism."""
    from aces_spark.operators.timeseries import rolling_stats

    rows = [
        (1, ts("2024-01-01 10:00") , 0.1 * i, i) for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    a = sorted(rolling_stats(df, "user_id", window_rows=7).collect())
    b = sorted(rolling_stats(df.repartition(11), "user_id", window_rows=7).collect())
    assert a == b


# ------------------------------------------------------- weighted sample

def test_weighted_sample_determinism_and_bias(spark):
    from aces_spark.datapipe.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, "w", k=40, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == 40
    # heavy weights dominate: nearly all winners come from the 50 heavy ids
    heavy = sum(1 for r in rows if r["doc_id"] < 50)
    assert heavy >= 30
    # deterministic under repartition (hash-derived keys, total order)
    again = weighted_sample(df.repartition(17), "w", k=40, id_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_weighted_sample_excludes_nonpositive(spark):
    from aces_spark.datapipe.sampling import weighted_sample
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double",
    )
    rows = weighted_sample(df, "w", k=10, id_col="doc_id").collect()
    assert [r["doc_id"] for r in rows] == [1]
    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "w", k=0)


# ------------------------------------------------- time-range rolling

def test_rolling_stats_time(spark):
    import datetime as _dt

    from aces_spark.operators.timeseries import rolling_stats_time

    rows = [
        (1, ts("2024-01-01 10:00"), 10.0, 1),
        (1, ts("2024-01-01 10:30"), 20.0, 2),
        (1, ts("2024-01-01 11:15"), 30.0, 3),  # 10:00 fell out of the 1h window
        (2, ts("2024-01-01 10:00"), 5.0, 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = {
        r["event_id"]: r
        for r in rolling_stats_time(df, "user_id", _dt.timedelta(hours=1)).collect()
    }
    assert out[1]["roll_n"] == 1 and out[1]["roll_mean"] == 10.0
    assert out[2]["roll_n"] == 2 and out[2]["roll_mean"] == 15.0
    assert out[3]["roll_n"] == 2 and out[3]["roll_sum"] == 50.0  # 20 + 30
    assert out[4]["roll_n"] == 1
    with pytest.raises(ValueError, match="positive"):
        rolling_stats_time(df, "user_id", _dt.timedelta(0))


# ------------------------------------------------------ anomaly z-score

def test_anomaly_zscore(spark):
    from aces_spark.datapipe.analytics import anomaly_zscore

    rows = [(1, float(v)) for v in [10, 10, 10, 10, 50]] + [(2, 7.0)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = anomaly_zscore(df, "user_id", threshold=1.5).collect()
    flagged = [r for r in out if r["is_anomaly"]]
    assert len(flagged) == 1 and flagged[0]["value"] == 50.0
    # constant key → stddev 0 → z defined as 0, never flagged
    solo = [r for r in out if r["user_id"] == 2][0]
    assert solo["zscore"] == 0.0 and not solo["is_anomaly"]


# -------------------------------------------------------- collocations

def test_collocations_pmi(spark):
    import math as _math

    from aces_spark.datapipe.lm import collocations

    docs = spark.createDataFrame(
        [(i, "machine learning rocks") for i in range(5)]
        + [(10 + i, "machine shop tools here") for i in range(5)],
        "doc_id long, text string",
    )
    out = {(r["prev"], r["word"]): r for r in collocations(docs, min_count=5).collect()}
    # "learning rocks" always co-occur: high PMI; sentinel pairs excluded
    assert ("<s>", "machine") not in out
    r = out[("learning", "rocks")]
    # n_total=25 adjacent pairs (2 per 3-token doc, 3 per 4-token doc)
    pmi = _math.log((5 / 25) / ((5 / 25) * (5 / 25)))
    assert r["pmi"] == _math.floor(pmi * 1e6 + 0.5) / 1e6


# -------------------------------------------------------- co-visitation

def test_covisitation_cap_and_dedup(spark):
    from aces_spark.datapipe.analytics import covisitation

    rows = [
        (1, "a"), (1, "a"), (1, "b"),          # dup (1,a) must not inflate
        (2, "a"), (2, "b"), (2, "c"),
        (3, "b"), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    out = {(r["item_a"], r["item_b"]): r["n_keys"] for r in covisitation(df, item_col="item").collect()}
    assert out[("a", "b")] == 2
    assert out[("b", "c")] == 2
    assert out[("a", "c")] == 1
    # cap: with max_items_per_key=2, user 2 keeps its 2 top items (count
    # ties → item asc: a, b) so (a,c)/(b,c) lose user 2
    capped = {
        (r["item_a"], r["item_b"]): r["n_keys"]
        for r in covisitation(df, item_col="item", max_items_per_key=2).collect()
    }
    assert capped[("a", "b")] == 2 and capped.get(("a", "c")) is None


# ---------------------------------------------- inline cell assignment

def test_inline_cell_expr_matches_assign_cells(spark):
    """The index-build fast path must agree with the DataFrame-based
    assignment operator row for row (same rounding, same tie rule)."""
    import hashlib

    from aces_spark.datapipe.similarity import (
        assign_cells,
        collect_centroid_rows,
        inline_cell_expr,
        seed_centroids,
    )
    from pyspark.sql import functions as F

    def vec(i):
        return [
            (int(hashlib.md5(f"{i}|{d}".encode()).hexdigest()[:6], 16) % 1000)
            / 1000.0
            for d in range(8)
        ]

    df = spark.createDataFrame(
        [(i, vec(i)) for i in range(200)], "vec_id long, embedding array<double>"
    )
    cents = seed_centroids(df, k=5)
    via_join = {
        r["vec_id"]: r["cell_id"] for r in assign_cells(df, cents).collect()
    }
    rows = collect_centroid_rows(cents)
    via_inline = {
        r["vec_id"]: r["cell_id"]
        for r in df.select(
            "vec_id", inline_cell_expr(F.col("embedding"), rows).alias("cell_id")
        ).collect()
    }
    assert via_inline == via_join


def test_sketches_ignore_null_values(spark):
    """COUNT(DISTINCT col) semantics: nulls never hash (a null hash
    would occupy a KMV top-k slot / a phantom HLL register — and Spark
    and other engines disagree on null sort order)."""
    from aces_spark.datapipe.sketches import hll_distinct, kmv_distinct

    base = spark.range(0, 100).select(F.col("id").alias("v"))
    with_nulls = base.union(
        spark.range(0, 5).select(F.lit(None).cast("long").alias("v"))
    )
    assert (
        kmv_distinct(with_nulls, "v", k=16).collect()
        == kmv_distinct(base, "v", k=16).collect()
    )
    assert (
        hll_distinct(with_nulls, "v").collect()
        == hll_distinct(base, "v").collect()
    )


def test_drift_null_category_single_row(spark):
    from aces_spark.datapipe.analytics import distribution_drift

    old = spark.createDataFrame([("en",), (None,)], "lang string")
    new = spark.createDataFrame([(None,), (None,)], "lang string")
    out = distribution_drift(old, new, "lang").collect()
    nulls = [r for r in out if r["value"] is None]
    # ONE matched null row, counted on both sides — not two unmatched ones
    assert len(nulls) == 1
    assert nulls[0]["n_old"] == 1 and nulls[0]["n_new"] == 2


def test_hll_merge_equals_union_sketch(spark):
    """Mergeability: sketch(A) ⊎ sketch(B) == sketch(A ∪ B), including
    overlapping values."""
    from aces_spark.datapipe.sketches import hll_distinct, hll_merge, hll_registers

    a = spark.range(0, 12000).select(F.col("id").alias("v"))
    b = spark.range(8000, 20000).select(F.col("id").alias("v"))  # overlaps a
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v")).collect()[0]
    direct = hll_distinct(a.union(b), "v").collect()[0]
    assert merged == direct
    import pytest as _pytest
    with _pytest.raises(ValueError, match="register table"):
        hll_merge()
