"""Tests for the training-export operators: decontamination, sequence
packing, split assignment, and vocabulary stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.decontam import decontaminate
from aces_spark.datapipe.packing import assign_splits, pack_sequences
from aces_spark.datapipe.text import vocab_top_k


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", "web"),
        (2, "a completely different document about spark physical plans", "web"),
        (3, "the quick brown fox jumps over the lazy dog again and again", "books"),
        (4, "short text", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_flags_benchmark_overlap(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_overlap"] for r in decontaminate(corpus, bench, n=5).collect()}
    # docs 1 and 3 share 5-grams with the benchmark; 2 and 4 don't
    assert set(hits) == {1, 3}
    assert all(v >= 1 for v in hits.values())
    # min_overlap filters
    strict = decontaminate(corpus, bench, n=5, min_overlap=10_000).collect()
    assert strict == []


def test_decontaminate_clean_composition(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    clean = corpus.join(decontaminate(corpus, bench, n=5), "doc_id", "left_anti")
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]


def test_pack_sequences_chunking(spark):
    # 3 docs of 4 tokens each in one stream, max_tokens=6:
    # doc1 starts at 0 (pack 0), doc2 at 4 (pack 0, spans into pack 1),
    # doc3 at 8 (pack 1)
    rows = [
        (1, "a b c d", "s"),
        (2, "e f g h", "s"),
        (3, "i j k l", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in pack_sequences(df, max_tokens=6).collect()}
    assert out[1]["token_start"] == 0 and out[1]["pack_id"] == 0 and not out[1]["spans_packs"]
    assert out[2]["token_start"] == 4 and out[2]["pack_id"] == 0 and out[2]["spans_packs"]
    assert out[2]["pack_offset"] == 4
    assert out[3]["token_start"] == 8 and out[3]["pack_id"] == 1 and not out[3]["spans_packs"]
    assert out[3]["pack_offset"] == 2


def test_pack_sequences_streams_independent(spark):
    rows = [(1, "a b", "x"), (2, "c d", "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in pack_sequences(df, max_tokens=8).collect()}
    # each source stream starts its own token space
    assert out[1]["token_start"] == 0 and out[2]["token_start"] == 0


def test_pack_sequences_empty_doc(spark):
    rows = [(1, "", "s"), (2, "a b c", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in pack_sequences(df, max_tokens=2).collect()}
    assert out[1]["n_tokens"] == 0 and not out[1]["spans_packs"]
    assert out[2]["token_start"] == 0 and out[2]["spans_packs"]


def test_pack_sequences_chunked_differential(spark):
    """The chunked (skew-safe) formulation must be bit-identical to the
    plain window, including across chunk boundaries and sparse doc_ids."""
    import random

    rng = random.Random(7)
    rows = [
        (i * 3 + rng.randrange(2), "w " * rng.randrange(9), f"s{i % 2}")
        for i in range(60)
    ]
    # dedupe keys (sparse, non-contiguous ids)
    seen, uniq = set(), []
    for k, t, s in rows:
        if k not in seen:
            seen.add(k)
            uniq.append((k, t, s))
    df = spark.createDataFrame(uniq, "doc_id long, text string, source string")
    plain = sorted(tuple(r) for r in pack_sequences(df, max_tokens=7).collect())
    for chunk_docs in (1, 5, 64, 1000):
        chunked = sorted(
            tuple(r) for r in pack_sequences(df, max_tokens=7, chunk_docs=chunk_docs).collect()
        )
        assert chunked == plain, chunk_docs


def test_assign_splits_deterministic_and_complete(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = assign_splits(df)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    # hash buckets are uniform: 90/5/5 within generous tolerance
    assert 850 <= counts["train"] <= 950
    # deterministic: re-running yields identical assignment
    again = {r["doc_id"]: r["split"] for r in assign_splits(df).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_assign_splits_validation(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-empty"):
        assign_splits(df, {})


def test_vocab_top_k(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r["word"], r["n_occurrences"], r["n_docs"]) for r in vocab_top_k(df, k=2).collect()]
    assert out == [("apple", 3, 2), ("banana", 1, 1)]  # tie banana/cherry → word asc


def test_jsonl_round_trip(spark, tmp_path):
    from aces_spark.sources.sinks import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, 'quote " and \\ backslash', "fr"), (3, None, None)],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(df, path, compression="gzip")
    back = read_jsonl(spark, path, schema="doc_id long, text string, lang string")
    got = sorted((r["doc_id"], r["text"], r["lang"]) for r in back.collect())
    assert got == [(1, "hello world", "en"), (2, 'quote " and \\ backslash', "fr"), (3, None, None)]


def test_jsonl_corrupt_records_surfaced_not_fatal(spark, tmp_path):
    from aces_spark.sources.sinks import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n{"doc_id": 2, "text": "fine"}\n')
    back = read_jsonl(
        spark, str(p), schema="doc_id long, text string, _corrupt_record string"
    )
    rows = back.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]
