"""Tests for datapipe/pq.py: product-quantization training, encoding, and
compressed-domain top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from aces_spark.datapipe.pq import (
    pq_compression_stats,
    pq_encode,
    pq_topk,
    pq_train,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


class TestPqTrain:
    def test_seed_codebook_is_sliced_corpus(self, spark):
        emb = _emb(spark)
        cb = pq_train(emb, m=4, n_codes=8)
        assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 16
        first = emb.orderBy("vec_id").first()["embedding"]
        for j in range(4):
            assert cb[j][0] == pytest.approx(first[j * 16 : (j + 1) * 16])

    def test_kmeans_codebook_shape(self, spark):
        cb = pq_train(_emb(spark), m=2, n_codes=4, quantizer="kmeans")
        assert len(cb) == 2 and len(cb[0]) == 4 and len(cb[0][0]) == 32

    def test_dim_not_divisible_raises(self, spark):
        with pytest.raises(ValueError, match="divisible"):
            pq_train(_emb(spark), m=7)

    def test_too_few_vectors_raises(self, spark):
        small = _emb(spark).filter(F.col("vec_id") < 3)
        with pytest.raises(ValueError, match="n_codes"):
            pq_train(small, m=4, n_codes=16)


class TestPqEncode:
    def test_seed_vectors_encode_to_self(self, spark):
        emb = _emb(spark)
        cb = pq_train(emb, m=4, n_codes=16)
        got = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(emb.filter(F.col("vec_id") < 16), cb).collect()
        }
        for i in range(16):
            assert got[i] == [i, i, i, i]

    def test_tie_break_first_min(self, spark):
        # two identical codewords -> the smaller code wins
        cb = [[[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]]]
        df = spark.createDataFrame([Row(vec_id=1, embedding=[0.1, 0.1])])
        out = pq_encode(df, cb).collect()
        assert out[0]["codes"] == [0]

    def test_narrow_plan(self, spark):
        emb = _emb(spark)
        cb = pq_train(emb, m=4, n_codes=8)
        plan = pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPqTopk:
    def test_matches_python_reconstruction(self, spark):
        emb = _emb(spark)
        cb = pq_train(emb, m=4, n_codes=16)
        codes_df = pq_encode(emb, cb)
        got = pq_topk(emb.filter(F.col("vec_id") < 3), codes_df, cb, k=3).collect()

        codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
        vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

        def adc(qv, code):
            total = 0.0
            for j in range(4):
                w = cb[j][code[j]]
                s = 0.0
                for i in range(16):
                    d = qv[j * 16 + i] - w[i]
                    s += d * d
                total += s
            return round(total, 6)

        for qid in range(3):
            expected = sorted(
                ((adc(vecs[qid], c), nid) for nid, c in codes.items() if nid != qid),
            )[:3]
            mine = sorted(
                (r["pq_dist"], r["neighbor_id"]) for r in got if r["query_id"] == qid
            )
            assert mine == [(pytest.approx(d), n) for d, n in expected]

    def test_compression_stats(self, spark):
        emb = _emb(spark)
        cb = pq_train(emb, m=4, n_codes=16)
        row = pq_compression_stats(pq_encode(emb, cb), dim=64, m=4).collect()[0]
        assert row["n_vectors"] == 500
        assert row["raw_bytes"] == 500 * 64 * 4
        assert row["coded_bytes"] == 500 * 4
        assert row["compression_x"] == 64.0


class TestIvfPqIndex:
    def test_full_probe_matches_pq_topk(self, spark, tmp_path):
        from aces_spark.datapipe.pq import (
            ivfpq_topk_indexed,
            save_ivfpq_index,
        )

        emb = _emb(spark)
        path = str(tmp_path / "ivfpq")
        save_ivfpq_index(emb, path, n_cells=8, quantizer="seed")
        qs = emb.filter(F.col("vec_id") < 4)

        # probing every cell recovers exactly the global compressed-domain
        # top-k (same codebook: seed n_codes=16 default in both paths)
        cb = pq_train(emb, m=4, n_codes=16)
        want = sorted(
            (r["query_id"], r["neighbor_id"], r["pq_dist"])
            for r in pq_topk(qs, pq_encode(emb, cb), cb, k=3).collect()
        )
        got_df = ivfpq_topk_indexed(spark, path, qs, k=3, n_probes=8)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["pq_dist"]) for r in got_df.collect()
        )
        assert got == want

    def test_partition_pruning_and_compressed_scan(self, spark, tmp_path):
        from aces_spark.datapipe.pq import (
            ivfpq_topk_indexed,
            save_ivfpq_index,
        )

        emb = _emb(spark)
        path = str(tmp_path / "ivfpq")
        save_ivfpq_index(emb, path, n_cells=8, quantizer="seed")
        qs = emb.filter(F.col("vec_id") < 2)
        out = ivfpq_topk_indexed(spark, path, qs, k=3, n_probes=2)
        assert out.count() == 6
        plan = out._jdf.queryExecution().executedPlan().toString()
        # static pruning on the cells scan …
        assert "PartitionFilters: [" in plan
        assert any(
            "cell_id" in seg[:200] for seg in plan.split("PartitionFilters: [")[1:]
        )
        # … and the scanned relation carries codes, never raw embeddings
        cells_schema = spark.read.parquet(f"{path}/cells").schema.fieldNames()
        assert "codes" in cells_schema and "embedding" not in cells_schema


def test_ivfpq_kmeans_quantizer_roundtrip(spark, tmp_path):
    """The production (kmeans) quantizer path builds, persists, and
    queries without the seed determinism crutch."""
    from aces_spark.datapipe.pq import ivfpq_topk_indexed, save_ivfpq_index

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq_km")
    save_ivfpq_index(emb, path, n_cells=4, quantizer="kmeans")
    out = ivfpq_topk_indexed(
        spark, path, emb.filter(F.col("vec_id") < 3), k=4, n_probes=2
    ).collect()
    assert len(out) == 12
    assert all(r["pq_dist"] >= 0 for r in out)


def test_pq_encode_with_kmeans_codebook(spark):
    from aces_spark.datapipe.pq import pq_encode, pq_train

    emb = _emb(spark)
    cb = pq_train(emb, m=4, n_codes=4, quantizer="kmeans")
    codes = pq_encode(emb, cb).collect()
    assert len(codes) == 500
    assert all(0 <= c < 4 for r in codes for c in r["codes"])
