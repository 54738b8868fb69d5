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
