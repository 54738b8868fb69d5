"""Round-7 operators: TF-IDF cosine pairs, interval coverage, decayed
sums, feature hashing, and reciprocal-rank fusion."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from conftest import ts


# ------------------------------------------------- tfidf_cosine_pairs


class TestTfidfCosinePairs:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "apple banana cherry apple"),
                (2, "banana apple apple cherry"),  # permutation of 1
                (3, "dog cat mouse"),
                (4, "apple banana"),  # subset-ish of 1
                (5, ""),
            ],
            "doc_id long, text string",
        )

    def test_permutation_has_cosine_one(self, spark):
        from aces_spark.datapipe.dedup import tfidf_cosine_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(self._docs(spark), threshold=0.0).collect()
        }
        # docs 1 and 2 have identical term multisets -> identical vectors
        assert got[(1, 2)] == pytest.approx(1.0, abs=2e-6)
        # and every returned pair is ordered and within [0, 1] + rounding
        for (a, b), c in got.items():
            assert a < b and 0.0 <= c <= 1.0 + 1e-9

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from aces_spark.datapipe.dedup import tfidf_cosine_pairs

        docs = self._docs(spark)
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        # python reference with the SAME micro-unit contract
        toks = {d: [w for w in t.lower().split() if w] for d, t in rows}
        n = len(rows)
        df_ = {}
        for d, ws in toks.items():
            for w in set(ws):
                df_[w] = df_.get(w, 0) + 1
        vecs = {
            d: {
                w: ws.count(w) * math.log((n + 1) / (df_[w] + 1))
                for w in set(ws)
            }
            for d, ws in toks.items()
        }
        n2 = {
            d: sum(math.floor(x * x * 1e6 + 0.5) for x in v.values())
            for d, v in vecs.items()
        }
        expected = {}
        ids = sorted(toks)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared = set(vecs[a]) & set(vecs[b])
                if not shared or n2[a] == 0 or n2[b] == 0:
                    continue
                dot = sum(
                    math.floor(vecs[a][w] * vecs[b][w] * 1e6 + 0.5) for w in shared
                )
                cos = (dot / 1e6) / math.sqrt((n2[a] / 1e6) * (n2[b] / 1e6))
                expected[(a, b)] = (len(shared), math.floor(cos * 1e6 + 0.5) / 1e6)
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_shared_terms"], r["cosine"])
            for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
        }
        assert got == expected

    def test_max_doc_freq_prunes_vocabulary(self, spark):
        from aces_spark.datapipe.dedup import tfidf_cosine_pairs

        docs = spark.createDataFrame(
            [(i, "common alpha") if i == 0 else (i, "common") for i in range(4)],
            "doc_id long, text string",
        )
        # 'common' is in all 4 docs; cap 3 removes it -> no shared terms
        assert (
            tfidf_cosine_pairs(docs, threshold=0.0, max_doc_freq=3).count() == 0
        )

    def test_threshold_filters(self, spark):
        from aces_spark.datapipe.dedup import tfidf_cosine_pairs

        out = tfidf_cosine_pairs(self._docs(spark), threshold=0.99)
        pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
        assert pairs == {(1, 2)}


# -------------------------------------------------- interval_coverage


class TestIntervalCoverage:
    def test_merges_overlaps_and_touching(self, spark):
        from aces_spark.operators.timeseries import interval_coverage

        df = spark.createDataFrame(
            [
                # key 1: [0,10) + [5,15) overlap; [15,20) touches -> one island
                (1, ts("2024-01-01 00:00"), ts("2024-01-01 00:10")),
                (1, ts("2024-01-01 00:05"), ts("2024-01-01 00:15")),
                (1, ts("2024-01-01 00:15"), ts("2024-01-01 00:20")),
                # key 1: gap, then [30,40)
                (1, ts("2024-01-01 00:30"), ts("2024-01-01 00:40")),
                # key 2: nested interval
                (2, ts("2024-01-01 00:00"), ts("2024-01-01 01:00")),
                (2, ts("2024-01-01 00:10"), ts("2024-01-01 00:20")),
                # empty interval is dropped
                (2, ts("2024-01-01 02:00"), ts("2024-01-01 02:00")),
            ],
            "k long, start_ts timestamp, end_ts timestamp",
        )
        got = sorted(
            (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
            for r in interval_coverage(df, "k").collect()
        )
        assert got == [
            (1, ts("2024-01-01 00:00"), ts("2024-01-01 00:20"), 3),
            (1, ts("2024-01-01 00:30"), ts("2024-01-01 00:40"), 1),
            (2, ts("2024-01-01 00:00"), ts("2024-01-01 01:00"), 2),
        ]

    def test_duplicate_intervals_merge(self, spark):
        from aces_spark.operators.timeseries import interval_coverage

        df = spark.createDataFrame(
            [(1, ts("2024-01-01 00:00"), ts("2024-01-01 00:10"))] * 3,
            "k long, start_ts timestamp, end_ts timestamp",
        )
        got = interval_coverage(df, "k").collect()
        assert len(got) == 1 and got[0]["n_intervals"] == 3


# ------------------------------------------------------- decayed_sum


class TestDecayedSum:
    def test_matches_python_reference(self, spark):
        from aces_spark.operators.timeseries import decayed_sum

        rows = [
            ("a", ts("2024-01-08 00:00"), 10.0),  # ref row (max ts)
            ("a", ts("2024-01-01 00:00"), 10.0),  # exactly one half-life old
            ("b", ts("2024-01-04 12:00"), 4.0),  # half a half-life
            ("b", ts("2024-01-08 00:00"), None),  # null value
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
        got = {
            r["k"]: (r["n_events"], r["decayed_sum"])
            for r in decayed_sum(
                df, "k", half_life=datetime.timedelta(days=7)
            ).collect()
        }
        ref = ts("2024-01-08 00:00")
        exp = {}
        for k in ("a", "b"):
            s = 0
            n = 0
            for kk, t, v in rows:
                if kk != k:
                    continue
                n += 1
                if v is None:
                    continue
                d_us = (ref - t) // datetime.timedelta(microseconds=1)
                s += math.floor(
                    v * 2.0 ** (-(d_us / (7 * 86400 * 1e6))) * 1e6 + 0.5
                )
            exp[k] = (n, s / 1e6)
        assert got == exp
        # sanity: one half-life halves the weight
        assert got["a"] == (2, pytest.approx(15.0, abs=1e-6))

    def test_explicit_ref_ts(self, spark):
        from aces_spark.operators.timeseries import decayed_sum

        df = spark.createDataFrame(
            [("a", ts("2024-01-01 00:00"), 8.0)],
            "k string, ts timestamp, value double",
        )
        got = decayed_sum(
            df,
            "k",
            half_life=datetime.timedelta(days=1),
            ref_ts=ts("2024-01-03 00:00"),
        ).collect()[0]
        assert got["decayed_sum"] == pytest.approx(2.0, abs=1e-6)

    def test_bad_half_life_raises(self, spark):
        from aces_spark.operators.timeseries import decayed_sum

        df = spark.createDataFrame(
            [("a", ts("2024-01-01 00:00"), 1.0)],
            "k string, ts timestamp, value double",
        )
        with pytest.raises(ValueError, match="half_life"):
            decayed_sum(df, "k", half_life=datetime.timedelta(0))


# --------------------------------------------------- feature_hashing


class TestFeatureHashing:
    def test_deterministic_and_signed(self, spark):
        from aces_spark.functions.features import feature_hashing

        docs = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "apple"), (3, "")],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, feature_hashing(docs).collect()))
        b = sorted(map(tuple, feature_hashing(docs).collect()))
        assert a == b
        # doc 2's single bucket carries |value| == 1; doc 1's apple
        # bucket carries ±2 in the same bucket with the same sign
        by_doc = {}
        for doc, bucket, value in a:
            by_doc.setdefault(doc, {})[bucket] = value
        assert 3 not in by_doc  # empty text -> no tokens -> no rows
        (b2, v2), = by_doc[2].items()
        assert abs(v2) == 1
        assert by_doc[1][b2] == 2 * v2  # tf=2, same term, same sign

    def test_unsigned_counts(self, spark):
        from aces_spark.functions.features import feature_hashing

        docs = spark.createDataFrame(
            [(1, "x y x y x")], "doc_id long, text string"
        )
        vals = sorted(
            r["value"] for r in feature_hashing(docs, signed=False).collect()
        )
        assert vals == [2, 3]  # y:2, x:3 (distinct buckets w.h.p.)

    def test_bucket_range(self, spark):
        from aces_spark.functions.features import feature_hashing

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id long, text string"
        )
        out = feature_hashing(docs, n_buckets=8).collect()
        assert all(0 <= r["bucket"] < 8 for r in out)
        with pytest.raises(ValueError, match="n_buckets"):
            feature_hashing(docs, n_buckets=0)


# ---------------------------------------------------------- rrf_fuse


class TestRrfFuse:
    def test_matches_hand_rrf(self, spark):
        from aces_spark.datapipe.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(10, 3.0), (20, 2.0), (30, 1.0)], "doc_id long, score double"
        )
        sem = spark.createDataFrame(
            [(20, 0.9), (40, 0.8)], "doc_id long, score double"
        )
        got = {
            r["doc_id"]: (r["n_lists"], r["rrf_score"])
            for r in rrf_fuse([lex, sem], k=60).collect()
        }

        def c(rank):
            return math.floor(1e6 / (60 + rank) + 0.5)

        assert got == {
            10: (1, c(1) / 1e6),
            20: (2, (c(2) + c(1)) / 1e6),
            30: (1, c(3) / 1e6),
            40: (1, c(2) / 1e6),
        }
        # doc 20 (rank 2 + rank 1) outranks doc 10 (single rank 1)
        assert got[20][1] > got[10][1]

    def test_score_ties_break_by_id(self, spark):
        from aces_spark.datapipe.retrieval import rrf_fuse

        tied = spark.createDataFrame(
            [(2, 1.0), (1, 1.0)], "doc_id long, score double"
        )
        got = {
            r["doc_id"]: r["rrf_score"]
            for r in rrf_fuse([tied], k=60).collect()
        }
        assert got[1] > got[2]  # lower id wins the tie -> better rank

    def test_per_query_partition(self, spark):
        from aces_spark.datapipe.retrieval import rrf_fuse

        lists = spark.createDataFrame(
            [("q1", 10, 2.0), ("q1", 20, 1.0), ("q2", 10, 5.0)],
            "qid string, doc_id long, score double",
        )
        got = {
            (r["qid"], r["doc_id"]): r["rrf_score"]
            for r in rrf_fuse([lists], k=60, by="qid").collect()
        }
        # doc 10 is rank 1 in BOTH queries despite different raw scores
        assert got[("q1", 10)] == got[("q2", 10)]

    def test_empty_rankings_raise(self, spark):
        from aces_spark.datapipe.retrieval import rrf_fuse

        with pytest.raises(ValueError, match="rankings"):
            rrf_fuse([])


# ---------------------------------------------- contamination_fraction


class TestContaminationFraction:
    def test_fraction_matches_hand_count(self, spark):
        from aces_spark.datapipe.decontam import contamination_fraction

        # 8-grams over 9 words -> 2 shingles per doc
        bench = spark.createDataFrame(
            [(100, "a b c d e f g h i")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f g h i"),  # both shingles hit -> 1.0
                (2, "a b c d e f g h x y"),  # 1 of 3 shingles hit
                (3, "q r s t u v w x y"),  # no overlap -> 0.0
                (4, "too short"),  # < 8 words -> absent
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["frac"])
            for r in contamination_fraction(corpus, bench, n=8).collect()
        }
        assert got == {
            1: (2, 2, 1.0),
            2: (3, 1, 0.3333),  # floor(1/3*1e4+0.5)/1e4
            3: (2, 0, 0.0),
        }

    def test_consistent_with_decontaminate_flag(self, spark):
        from aces_spark.datapipe.decontam import (
            contamination_fraction,
            decontaminate,
        )

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog tonight")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight ok"),
                (2, "completely different words in this unrelated document here"),
            ],
            "doc_id long, text string",
        )
        flagged = {r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()}
        frac = {
            r["doc_id"]: r["n_overlap"]
            for r in contamination_fraction(corpus, bench, n=8).collect()
        }
        # the flag form is exactly "frac's n_overlap >= min_overlap"
        assert flagged == {d for d, o in frac.items() if o >= 1}


# --------------------------------------- property-based differentials


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=0, max_value=50),  # start minute
            st.integers(min_value=0, max_value=15),  # duration minutes
        ),
        min_size=0,
        max_size=25,
    )
)
def test_interval_coverage_matches_python_merge(spark, data):
    from aces_spark.operators.timeseries import interval_coverage

    base = ts("2024-01-01 00:00")
    rows = [
        (k, base + datetime.timedelta(minutes=s), base + datetime.timedelta(minutes=s + d))
        for k, s, d in data
    ]
    df = spark.createDataFrame(
        rows, "k long, start_ts timestamp, end_ts timestamp"
    ) if rows else spark.createDataFrame([], "k long, start_ts timestamp, end_ts timestamp")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in interval_coverage(df, "k").collect()
    )
    # python reference: sort, sweep, merge touching-or-overlapping
    expected = []
    for k in sorted({r[0] for r in rows}):
        ivs = sorted((s, e) for kk, s, e in rows if kk == k and s < e)
        cur = None
        for s, e in ivs:
            if cur is None or s > cur[1]:
                if cur:
                    expected.append((k, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        if cur:
            expected.append((k, cur[0], cur[1], cur[2]))
    assert got == sorted(expected)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=30,
    ),
    max_degree=st.one_of(st.none(), st.integers(min_value=2, max_value=6)),
)
def test_adamic_adar_matches_python_reference(spark, edges, max_degree):
    from aces_spark.operators.graph import adamic_adar

    df = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    got = {
        (r["u"], r["v"]): (r["n_common"], r["score"])
        for r in adamic_adar(df, max_degree=max_degree).collect()
    }
    # python reference with the same micro-unit contract
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[tuple[int, int], tuple[int, float]] = {}
    nodes = sorted(adj)
    for w in nodes:
        deg = len(adj[w])
        if deg < 2 or (max_degree is not None and deg > max_degree):
            continue
        w_u6 = math.floor(1e6 / math.log(deg) + 0.5)
        nbrs = sorted(adj[w])
        for i, u in enumerate(nbrs):
            for v in nbrs[i + 1 :]:
                n, s = expected.get((u, v), (0, 0))
                expected[(u, v)] = (n + 1, s + w_u6)
    expected = {k: (n, s / 1e6) for k, (n, s) in expected.items()}
    assert got == expected


# ----------------------------------------------------- WAV audio core


import struct


def _wav(bits, channels, rate, data):
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWavDecode:
    def test_16bit_mono_exact(self):
        import numpy as np

        from aces_spark.datapipe.multimodal import _audio_feature, decode_wav

        samples = [0, 16384, -16384, 32767, -32768, 0]
        payload = _wav(16, 1, 8000, struct.pack("<6h", *samples))
        x, rate = decode_wav(payload)
        assert rate == 8000 and x.shape == (6, 1)
        assert np.allclose(x[:, 0], np.array(samples) / 32768.0)
        f = _audio_feature(x, rate)
        assert f[0] == 6.0 and f[1] == 8000.0 and f[2] == 1.0
        mono = np.array(samples) / 32768.0
        assert f[3] == round(float(np.sqrt((mono ** 2).mean())), 4)
        assert f[4] == round(32767 / 32768, 4)
        assert f[7] == round(2 / 6, 4)  # 32767 and -32768 clip at 0.999

    def test_8bit_stereo_unsigned_offset(self):
        import numpy as np

        from aces_spark.datapipe.multimodal import decode_wav

        # L channel silence (128 = 0.0), R channel full positive (255)
        data = bytes([128, 255] * 4)
        x, rate = decode_wav(_wav(8, 2, 44100, data))
        assert rate == 44100 and x.shape == (4, 2)
        assert np.allclose(x[:, 0], 0.0)
        assert np.allclose(x[:, 1], 127 / 128)

    def test_unsupported_and_corrupt(self):
        import pytest as pt

        from aces_spark.datapipe.multimodal import DecodeNotAvailable, decode_wav

        with pt.raises(DecodeNotAvailable):
            decode_wav(b"not a wav" * 10)
        # float PCM (format 3) is unsupported, not corrupt
        p = bytearray(_wav(16, 1, 8000, struct.pack("<2h", 0, 0)))
        p[20:22] = struct.pack("<H", 3)
        with pt.raises(DecodeNotAvailable):
            decode_wav(bytes(p))
        # truncated data chunk IS corrupt
        good = _wav(16, 1, 8000, struct.pack("<4h", 1, 2, 3, 4))
        with pt.raises(ValueError):
            decode_wav(good[:-3])

    def test_extract_features_sniffs_wav(self, spark):
        from aces_spark.datapipe.multimodal import extract_features

        wav = _wav(16, 2, 16000, struct.pack("<8h", *([1000, -1000] * 4)))
        media = spark.createDataFrame(
            [(1, bytearray(wav), "audio"), (2, bytearray(b"plain text"), "text")],
            "media_id long, payload binary, media_type string",
        )
        got = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
        assert got[1][0] == 4.0 and got[1][1] == 16000.0 and got[1][2] == 2.0
        assert len(got[2]) == 8  # byte fallback stays 8-dim


def test_decayed_sum_is_incrementally_mergeable(spark):
    """The docstring's incremental claim, pinned: at a FIXED reference
    timestamp, decayed_sum over a union equals the sum of per-batch
    results (weights depend only on ref), so daily batches merge without
    rescanning history."""
    from aces_spark.operators.timeseries import decayed_sum

    ref = ts("2024-02-01 00:00")
    hl = datetime.timedelta(days=3)
    b1 = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00"), 5.0), ("b", ts("2024-01-10 00:00"), 2.0)],
        "k string, ts timestamp, value double",
    )
    b2 = spark.createDataFrame(
        [("a", ts("2024-01-20 00:00"), 7.0), ("c", ts("2024-01-31 00:00"), 1.0)],
        "k string, ts timestamp, value double",
    )
    full = {
        r["k"]: (r["n_events"], r["decayed_sum"])
        for r in decayed_sum(b1.unionByName(b2), "k", half_life=hl, ref_ts=ref).collect()
    }
    merged: dict[str, tuple[int, float]] = {}
    for b in (b1, b2):
        for r in decayed_sum(b, "k", half_life=hl, ref_ts=ref).collect():
            n, s = merged.get(r["k"], (0, 0.0))
            merged[r["k"]] = (n + r["n_events"], round(s + r["decayed_sum"], 6))
    assert {k: (n, round(s, 6)) for k, (n, s) in full.items()} == merged


# --------------------------------------------------- token_budget_fill


class TestTokenBudgetFill:
    def _docs(self, spark):
        rows = []
        for i in range(30):
            dom = "web" if i % 3 else "books"
            rows.append((i, dom, "tok " * (5 + i % 7)))
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_quota_respected_and_cum_consistent(self, spark):
        from aces_spark.datapipe.selection import token_budget_fill

        out = token_budget_fill(self._docs(spark), token_budget=80).collect()
        assert out, "budget 80 over ~180 tokens must keep something"
        by_dom: dict[str, list] = {}
        for r in out:
            assert r["cum_tokens"] <= r["quota_tokens"]
            by_dom.setdefault(r["domain"], []).append(r)
        for rows in by_dom.values():
            rows.sort(key=lambda r: r["cum_tokens"])
            run = 0
            for r in rows:
                run += r["n_tokens"]
                assert r["cum_tokens"] == run  # kept set is a fill PREFIX

    def test_bigger_budget_only_appends(self, spark):
        from aces_spark.datapipe.selection import token_budget_fill

        docs = self._docs(spark)
        small = {r["doc_id"] for r in token_budget_fill(docs, 60).collect()}
        big = {r["doc_id"] for r in token_budget_fill(docs, 140).collect()}
        assert small <= big

    def test_full_budget_takes_everything(self, spark):
        from aces_spark.datapipe.selection import token_budget_fill

        docs = self._docs(spark)
        out = token_budget_fill(docs, 10_000_000).collect()
        assert len(out) == 30  # quota clamps at availability, all kept

    def test_validation(self, spark):
        from aces_spark.datapipe.selection import token_budget_fill

        with pytest.raises(ValueError, match="token_budget"):
            token_budget_fill(self._docs(spark), -1)
        with pytest.raises(ValueError, match="alpha_pct"):
            token_budget_fill(self._docs(spark), 10, alpha_pct=101)
