"""SQ8 scalar quantization + the pairless corpus-diversity identity +
norm z-score outliers."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _vectors(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------------------- SQ8


class TestSQ8:
    def test_roundtrip_error_within_half_cell(self, spark):
        from aces_spark.datapipe.sq import (
            collect_sq8_bounds,
            sq8_bounds,
            sq8_dequantize,
            sq8_encode,
        )

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-3, 3) for _ in range(8)]) for i in range(50)]
        vecs = _vectors(spark, rows)
        lo, hi = collect_sq8_bounds(sq8_bounds(vecs))
        deq = sq8_dequantize(sq8_encode(vecs, lo, hi), lo, hi).collect()
        by_id = {r["vec_id"]: r["xhat"] for r in deq}
        for i, v in rows:
            for d, (x, xh) in enumerate(zip(v, by_id[i])):
                half_cell = (hi[d] - lo[d]) / 255.0 / 2.0
                assert abs(x - xh) <= half_cell + 1e-12

    def test_endpoints_reconstruct_exactly(self, spark):
        from aces_spark.datapipe.sq import (
            collect_sq8_bounds,
            sq8_bounds,
            sq8_dequantize,
            sq8_encode,
        )

        vecs = _vectors(spark, [(1, [0.0, -5.0]), (2, [10.0, 5.0]), (3, [5.0, 0.0])])
        lo, hi = collect_sq8_bounds(sq8_bounds(vecs))
        assert (lo, hi) == ([0.0, -5.0], [10.0, 5.0])
        got = {
            r["vec_id"]: r["xhat"]
            for r in sq8_dequantize(sq8_encode(vecs, lo, hi), lo, hi).collect()
        }
        # min and max of every dimension are codes 0 and 255 -> exact
        assert got[1] == [0.0, -5.0]
        assert got[2] == [10.0, 5.0]

    def test_degenerate_dim_codes_zero_and_reconstructs_lo(self, spark):
        from aces_spark.datapipe.sq import (
            collect_sq8_bounds,
            sq8_bounds,
            sq8_dequantize,
            sq8_encode,
        )

        vecs = _vectors(spark, [(1, [1.0, 2.5]), (2, [9.0, 2.5])])
        lo, hi = collect_sq8_bounds(sq8_bounds(vecs))
        enc = sq8_encode(vecs, lo, hi)
        assert {r["codes"][1] for r in enc.collect()} == {0}
        deq = {r["vec_id"]: r["xhat"][1] for r in sq8_dequantize(enc, lo, hi).collect()}
        assert deq == {1: 2.5, 2: 2.5}

    def test_levels_validated(self, spark):
        from aces_spark.datapipe.sq import sq8_encode

        with pytest.raises(ValueError):
            sq8_encode(_vectors(spark, [(1, [0.0])]), [0.0], [1.0], levels=1)

    @staticmethod
    def _python_adc_topk(rows, query_ids, k):
        """Pure-Python replica of the integer ADC contract: per-dim
        bounds, affine codes, micro-unit qs/kq snaps, exact int score."""
        dim = len(rows[0][1])
        data = dict(rows)
        lo = [min(v[d] for v in data.values()) for d in range(dim)]
        hi = [max(v[d] for v in data.values()) for d in range(dim)]
        scale = [(h - l) / 255.0 for l, h in zip(lo, hi)]

        def codes(v):
            out = []
            for x, l, h in zip(v, lo, hi):
                if h == l:
                    out.append(0)
                else:
                    out.append(
                        min(max(int(math.floor((x - l) / (h - l) * 255.0 + 0.5)), 0), 255)
                    )
            return out

        want = {}
        for qid in query_ids:
            q = data[qid]
            qs_u = [int(math.floor(x * s * 1000000.0 + 0.5)) for x, s in zip(q, scale)]
            kq = 0.0
            for x, l in zip(q, lo):
                kq += x * l
            kq_u = int(math.floor(kq * 1000000.0 + 0.5))
            scored = []
            for nid, v in data.items():
                if nid == qid:
                    continue
                adc_u = kq_u + sum(u * c for u, c in zip(qs_u, codes(v)))
                scored.append((-(adc_u / 1000000.0), nid))
            scored.sort()
            want[qid] = [(nid, -neg) for neg, nid in scored[:k]]
        return want

    def test_topk_matches_python_adc_differential(self, spark):
        """Differential against a pure-Python replica of the integer ADC
        contract — on the lossless 256-level grid the ranking also equals
        the exact dot ranking (quantization moves each score < 4 µ)."""
        from aces_spark.datapipe.sq import sq8_topk

        rng = random.Random(13)
        rows = [
            (i, [lo + rng.randrange(256) / 255.0 * (hi - lo)
                 for lo, hi in [(-1.0, 1.0)] * 6])
            for i in range(40)
        ]
        # pin the global per-dim extremes so the grid is exactly [-1, 1]
        rows += [(100, [-1.0] * 6), (101, [1.0] * 6)]
        vecs = _vectors(spark, rows)
        got = sq8_topk(vecs, vecs.filter(F.col("vec_id") < 3), k=4).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adc_dot"]))
        want = self._python_adc_topk(rows, sorted(by_q), 4)
        assert by_q == want
        # lossless grid ⇒ the ADC ranking equals the exact-dot ranking
        data = dict(rows)
        for qid, neigh in by_q.items():
            exact = sorted(
                ((-(sum(a * b for a, b in zip(data[qid], data[n]))), n)
                 for n in data if n != qid),
            )[:4]
            assert [n for n, _ in neigh] == [n for _, n in exact]

    def test_topk_batched_parity(self, spark):
        """impl='batched' (Arrow int64 matmul + per-batch prune) is
        BIT-IDENTICAL to the column path — the point of the integer
        score contract."""
        from aces_spark.datapipe.sq import sq8_topk

        rng = random.Random(29)
        rows = [(i, [rng.uniform(-2, 2) for _ in range(7)]) for i in range(60)]
        vecs = _vectors(spark, rows)
        queries = vecs.filter(F.col("vec_id") < 4)
        col = sorted(map(tuple, sq8_topk(vecs, queries, k=5).collect()))
        bat = sorted(
            map(tuple, sq8_topk(vecs, queries, k=5, impl="batched").collect())
        )
        assert col == bat and len(col) == 20

    def test_topk_batched_query_cap(self, spark):
        from aces_spark.datapipe import sq as sq_mod

        vecs = _vectors(spark, [(i, [float(i), 1.0]) for i in range(5)])
        old = sq_mod._BATCHED_MAX_QUERIES
        sq_mod._BATCHED_MAX_QUERIES = 2
        try:
            with pytest.raises(ValueError, match="cap"):
                sq_mod.sq8_topk(vecs, vecs, k=2, impl="batched").collect()
        finally:
            sq_mod._BATCHED_MAX_QUERIES = old


# ------------------------------------------------- corpus_diversity


class TestCorpusDiversity:
    def test_matches_bruteforce_mean_pairwise_cosine(self, spark):
        from aces_spark.datapipe.similarity import corpus_diversity

        rng = random.Random(3)
        rows = [(i, [rng.gauss(0.3, 1) for _ in range(5)]) for i in range(30)]
        got = corpus_diversity(_vectors(spark, rows)).collect()[0]
        unit = [
            [x / math.sqrt(sum(y * y for y in v)) for x in v] for _, v in rows
        ]
        n = len(unit)
        brute = (
            sum(
                sum(a * b for a, b in zip(unit[i], unit[j]))
                for i in range(n)
                for j in range(n)
                if i != j
            )
            / n
            / (n - 1)
        )
        assert got["n_vectors"] == n
        # micro-unit snapping costs ~1e-6 per coord; tolerance 1e-4
        assert got["mean_pairwise_cosine"] == pytest.approx(brute, abs=1e-4)

    def test_identical_vectors_give_one(self, spark):
        from aces_spark.datapipe.similarity import corpus_diversity

        vecs = _vectors(spark, [(i, [1.0, 2.0, 2.0]) for i in range(5)])
        got = corpus_diversity(vecs).collect()[0]
        assert got["mean_pairwise_cosine"] == pytest.approx(1.0, abs=1e-5)

    def test_zero_norm_rows_excluded(self, spark):
        from aces_spark.datapipe.similarity import corpus_diversity

        vecs = _vectors(
            spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])]
        )
        got = corpus_diversity(vecs).collect()[0]
        assert got["n_vectors"] == 2
        assert got["mean_pairwise_cosine"] == pytest.approx(0.0, abs=1e-5)


# -------------------------------------------- embedding_norm_outliers


class TestNormOutliers:
    def test_z_scores_match_population_formula(self, spark):
        from aces_spark.datapipe.similarity import embedding_norm_outliers

        rows = [(i, [float(i + 1), 0.0]) for i in range(6)]  # norms 1..6
        got = {
            r["vec_id"]: r
            for r in embedding_norm_outliers(_vectors(spark, rows)).collect()
        }
        norms = [float(i + 1) for i in range(6)]
        mean = sum(norms) / 6
        std = math.sqrt(sum((x - mean) ** 2 for x in norms) / 6)
        for i in range(6):
            assert got[i]["norm"] == pytest.approx(norms[i], abs=1e-6)
            assert got[i]["z"] == pytest.approx((norms[i] - mean) / std, abs=1e-3)

    def test_blown_up_vector_is_flagged(self, spark):
        from aces_spark.datapipe.similarity import embedding_norm_outliers

        rows = [(i, [1.0, 1.0]) for i in range(20)] + [(99, [500.0, 0.0])]
        got = {
            r["vec_id"]: r["is_outlier"]
            for r in embedding_norm_outliers(_vectors(spark, rows)).collect()
        }
        assert got[99] is True
        assert sum(got.values()) == 1

    def test_zero_variance_gives_null_z_not_outlier(self, spark):
        from aces_spark.datapipe.similarity import embedding_norm_outliers

        rows = [(i, [3.0, 4.0]) for i in range(4)]
        got = embedding_norm_outliers(_vectors(spark, rows)).collect()
        assert all(r["z"] is None for r in got)
        assert all(r["is_outlier"] is False for r in got)


# ------------------------------------------------------------ binary codes


def test_binary_codes_python_differential(spark):
    import random

    from aces_spark.datapipe.sq import binary_codes

    rng = random.Random(7)
    dim = 70  # 2 words; exercises bit 63 and the partial second word
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(20)]
    rows.append((100, [0.0] * dim))          # zeros -> all bits clear
    rows.append((101, [1.0] * dim))          # all set incl. bit 63
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["codes"] for r in binary_codes(df, dim=dim).collect()}

    def ref(v):
        out = []
        for w in range((dim + 63) // 64):
            word = 0
            for i in range(64):
                d = w * 64 + i
                if d < dim and v[d] > 0:
                    word |= 1 << i
            if word >= 1 << 63:
                word -= 1 << 64  # two's complement long
            out.append(word)
        return out

    for vid, v in rows:
        assert got[vid] == ref(v), f"vec {vid}"
    assert got[100] == [0, 0]
    assert got[101][0] == -1  # all 64 bits set == -1 in two's complement


def test_hamming_topk_matches_brute_force(spark):
    import random

    from aces_spark.datapipe.sq import hamming_topk

    rng = random.Random(11)
    dim = 64
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter("vec_id < 3")
    got = [
        (r["query_id"], r["neighbor_id"], r["hamming"])
        for r in hamming_topk(df, queries, k=4, dim=dim).collect()
    ]

    def bits(v):
        return [x > 0 for x in v]

    want = []
    for qid in range(3):
        qb = bits(rows[qid][1])
        ds = sorted(
            (sum(a != b for a, b in zip(bits(v), qb)), vid)
            for vid, v in rows
            if vid != qid
        )[:4]
        want += [(qid, vid, d) for d, vid in ds]
    assert sorted(got) == sorted(want)


def test_binary_codes_validation(spark):
    from aces_spark.datapipe.sq import binary_codes, hamming_topk

    df = spark.createDataFrame([(1, [0.1])], ["vec_id", "embedding"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        binary_codes(df, dim=0)
    with _pytest.raises(ValueError):
        hamming_topk(df, df, k=0, dim=1)
