"""Greedy max-coverage selection + temperature-scaled domain mixing
(datapipe/selection.py) — hand-computed goldens and determinism checks."""

from __future__ import annotations

import pytest

from aces_spark.datapipe.selection import (
    greedy_coverage_select,
    temperature_mix_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_coverage_hand_computed(spark):
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "b c d e"), (3, "a f"), (4, "x")],
    )
    assert greedy_coverage_select(docs, k=3) == [(2, 4), (3, 2), (4, 1)]
    # k larger than useful picks: doc 1 contributes nothing after 2,3,4
    assert greedy_coverage_select(docs, k=10) == [(2, 4), (3, 2), (4, 1)]


def test_greedy_coverage_tie_breaks_on_doc_id(spark):
    docs = _docs(spark, [(2, "c d"), (1, "a b")])
    assert greedy_coverage_select(docs, k=1) == [(1, 2)]


def test_greedy_coverage_duplicate_words_count_once(spark):
    docs = _docs(spark, [(1, "a a a a a"), (2, "b c")])
    # doc 1 has 5 tokens but 1 distinct word; doc 2 wins round 1
    assert greedy_coverage_select(docs, k=2) == [(2, 2), (1, 1)]


def test_greedy_coverage_validates(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        greedy_coverage_select(docs, k=0)


def test_temperature_mix_alpha_half(spark):
    docs = spark.createDataFrame(
        [(i, "t", "A") for i in range(4)] + [(99, "t", "B")],
        "doc_id long, text string, source string",
    )
    got = {r["domain"]: r for r in temperature_mix_weights(docs).collect()}
    assert got["A"]["n_docs"] == 4 and got["A"]["weight_u"] == 2_000_000
    assert got["B"]["weight_u"] == 1_000_000
    assert got["A"]["share_bp"] == 6667 and got["B"]["share_bp"] == 3333


def test_temperature_mix_alpha_extremes(spark):
    docs = spark.createDataFrame(
        [(i, "t", "A") for i in range(4)] + [(99, "t", "B")],
        "doc_id long, text string, source string",
    )
    a100 = {r["domain"]: r["share_bp"] for r in temperature_mix_weights(docs, alpha_pct=100).collect()}
    assert a100 == {"A": 8000, "B": 2000}
    a0 = {r["domain"]: r["share_bp"] for r in temperature_mix_weights(docs, alpha_pct=0).collect()}
    assert a0 == {"A": 5000, "B": 5000}
    with pytest.raises(ValueError):
        temperature_mix_weights(docs, alpha_pct=101)


def test_temperature_mix_plan_scans_corpus_once(spark):
    docs = spark.createDataFrame(
        [(1, "t", "A"), (2, "t", "B")], "doc_id long, text string, source string"
    )
    plan = (
        temperature_mix_weights(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one domain-keyed exchange; the total is a window over the tiny
    # domain relation, NOT a join that would plan the scan twice
    assert plan.count("Exchange hashpartitioning") <= 1
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan
