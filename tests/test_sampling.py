"""Unit tests for deterministic stratified sampling."""
from __future__ import annotations

import pytest

from aces_spark.datapipe.sampling import (
    BUCKETS,
    sample_bucket_expr,
    stratified_sample,
    stratified_take,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_rates_are_approximate_and_deterministic(corpus):
    out = stratified_sample(corpus, {"en": 0.5, "de": 0.1})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # 200 docs per stratum; md5 buckets are uniform, allow wide tolerance
    assert 70 <= counts.get("en", 0) <= 130
    assert 5 <= counts.get("de", 0) <= 40
    again = stratified_sample(corpus, {"en": 0.5, "de": 0.1})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_unlisted_stratum_uses_default_rate(corpus):
    none_kept = stratified_sample(corpus, {"en": 0.5})
    assert none_kept.filter("lang = 'de'").count() == 0
    all_kept = stratified_sample(corpus, {"en": 0.5}, default_rate=1.0)
    assert all_kept.filter("lang = 'de'").count() == 200


def test_rate_bounds(corpus):
    assert stratified_sample(corpus, {"en": 1.0, "de": 1.0}).count() == 400
    assert stratified_sample(corpus, {"en": 0.0, "de": 0.0}).count() == 0


def test_take_exact_k_per_stratum(corpus):
    out = stratified_take(corpus, k=25)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"en": 25, "de": 25}
    # deterministic: same 50 ids both times, ranks contiguous from 1
    a = sorted((r["lang"], r["sample_rank"], r["doc_id"]) for r in out.collect())
    b = sorted((r["lang"], r["sample_rank"], r["doc_id"]) for r in stratified_take(corpus, k=25).collect())
    assert a == b
    assert {x[1] for x in a} == set(range(1, 26))


def test_seed_changes_selection(corpus):
    s0 = {r["doc_id"] for r in stratified_sample(corpus, {"en": 0.3}, seed=0).collect()}
    s1 = {r["doc_id"] for r in stratified_sample(corpus, {"en": 0.3}, seed=1).collect()}
    assert s0 != s1


class TestMixSample:
    def test_binding_stratum_kept_fully(self, spark):
        # 300 en / 100 de, target 50/50 -> de binds (T=200): de kept 100%,
        # en rate = 100/300
        rows = [(i, "en" if i < 300 else "de") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        from aces_spark.datapipe.sampling import mix_sample

        out = mix_sample(df, {"en": 0.5, "de": 0.5})
        by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()}
        assert by_lang["de"] == 100  # binding stratum: every row kept
        # en is hash-thresholded at 3333/10000 -> close to 100 in expectation
        assert 70 <= by_lang["en"] <= 130

    def test_unlisted_stratum_dropped(self, spark):
        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        from aces_spark.datapipe.sampling import mix_sample

        out = mix_sample(df, {"en": 0.5, "de": 0.5})
        assert out.filter("lang = 'fr'").count() == 0

    def test_no_matching_stratum_raises(self, spark):
        df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
        from aces_spark.datapipe.sampling import mix_sample

        with pytest.raises(ValueError):
            mix_sample(df, {"xx": 1.0})

    def test_deterministic(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        from aces_spark.datapipe.sampling import mix_sample

        a = sorted(r["doc_id"] for r in mix_sample(df, {"en": 0.7, "de": 0.3}).collect())
        b = sorted(r["doc_id"] for r in mix_sample(df, {"en": 0.7, "de": 0.3}).collect())
        assert a == b and len(a) > 0


def test_mix_sample_weights_are_ratios(spark):
    """Weights need not sum to 1 — only ratios matter (2:1 == 0.667:0.333)."""
    from aces_spark.datapipe.sampling import mix_sample

    rows = [(i, "en" if i < 300 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in mix_sample(df, {"en": 2.0, "de": 1.0}).collect())
    b = sorted(
        r["doc_id"] for r in mix_sample(df, {"en": 2 / 3, "de": 1 / 3}).collect()
    )
    assert a == b


def test_mix_sample_missing_weighted_stratum_raises(spark):
    from aces_spark.datapipe.sampling import mix_sample

    df = spark.createDataFrame([(1, "en"), (2, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="absent from the data"):
        mix_sample(df, {"en": 0.5, "zh": 0.5})
    # strict=False opts into renormalization over present strata
    out = mix_sample(df, {"en": 0.5, "zh": 0.5}, strict=False)
    assert out.count() == 2
