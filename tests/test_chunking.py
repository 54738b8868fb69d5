"""Tests for datapipe/chunking.py: sliding-window chunking and corpus
rarity scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from aces_spark.datapipe.chunking import chunk_documents, rare_token_stats


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestChunkDocuments:
    def test_window_count_and_overlap(self, spark):
        words = " ".join(f"w{i}" for i in range(10))
        out = chunk_documents(
            _docs(spark, [(1, words)]), chunk_tokens=4, stride=3
        ).orderBy("chunk_idx")
        rows = out.collect()
        # n=10, chunk=4, stride=3 -> 1 + ceil(6/3) = 3 chunks
        assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
        assert all(r["n_chunks"] == 3 for r in rows)
        assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
        assert rows[1]["chunk_text"] == "w3 w4 w5 w6"
        assert rows[2]["chunk_text"] == "w6 w7 w8 w9"
        assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]

    def test_short_and_empty_docs(self, spark):
        out = chunk_documents(
            _docs(spark, [(1, "only two"), (2, "   "), (3, "")]),
            chunk_tokens=5,
            stride=3,
        ).collect()
        assert len(out) == 1  # empty docs vanish; short doc -> one chunk
        assert out[0]["doc_id"] == 1
        assert out[0]["chunk_text"] == "only two"
        assert out[0]["n_chunk_tokens"] == 2

    def test_tail_chunk_short_but_present(self, spark):
        words = " ".join(f"w{i}" for i in range(11))
        rows = (
            chunk_documents(_docs(spark, [(1, words)]), chunk_tokens=4, stride=3)
            .orderBy("chunk_idx")
            .collect()
        )
        # n=11 -> 1 + ceil(7/3) = 4 chunks; last starts at token 9, len 2
        assert len(rows) == 4
        assert rows[-1]["chunk_text"] == "w9 w10"
        assert rows[-1]["n_chunk_tokens"] == 2

    def test_every_token_covered(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        chunks = chunk_documents(docs, chunk_tokens=64, stride=48)
        from aces_spark.datapipe.text import norm_tokens

        total = (
            docs.select(F.explode(norm_tokens("text")).alias("w")).count()
        )
        # strided windows cover every token at least once: the union of
        # [i*stride, i*stride+chunk) over n_chunks windows covers [0, n)
        covered = (
            chunks.groupBy("doc_id")
            .agg(
                F.max(F.col("chunk_idx") * 48 + F.col("n_chunk_tokens")).alias("end"),
            )
            .agg(F.sum("end"))
            .collect()[0][0]
        )
        assert covered >= total

    def test_narrow_plan_no_exchange(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_bad_params(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=0)


class TestRareTokenStats:
    def test_rarity_flags(self, spark):
        # 'common' appears 3x (> max_count=2), 'rare1'/'rare2' once each
        rows = [
            (1, "common rare1 common"),
            (2, "common rare2"),
        ]
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_rare"], r["rare_frac"])
            for r in rare_token_stats(_docs(spark, rows), max_count=2).collect()
        }
        assert got[1] == (3, 1, 0.3333)
        assert got[2] == (2, 1, 0.5)

    def test_broadcast_variant_matches(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, rare_token_stats(docs, max_count=2).collect()))
        b = sorted(
            map(tuple, rare_token_stats(docs, max_count=2, broadcast_rare=True).collect())
        )
        assert a == b
