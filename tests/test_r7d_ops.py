"""Round-7 batch D: encoding-artifact detection + cross-corpus
vocabulary divergence."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from aces_spark.datapipe.text import encoding_artifacts, vocab_divergence

MOJI = "cafÃ© âhelloâ"


def test_encoding_artifacts_counts(spark):
    rows = [
        (1, "clean ascii text"),
        (2, MOJI),                       # 3 digraph hits
        (3, "bad�byte andctrl"),
        (4, "zero​width﻿here‍"),
        (5, ""),
        (6, "tab\tand\nnewline are fine"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in encoding_artifacts(df).collect()}
    assert got[1]["is_damaged"] is False
    assert got[2]["n_mojibake"] == 3 and got[2]["is_damaged"] is True
    assert (got[3]["n_replacement"], got[3]["n_control"]) == (1, 1)
    assert got[3]["artifact_bp"] == math.floor(2 * 10000 / len(rows[2][1]))
    assert got[4]["n_zero_width"] == 3
    assert got[5] == {
        "doc_id": 5, "n_chars": 0, "n_replacement": 0, "n_control": 0,
        "n_mojibake": 0, "n_zero_width": 0, "artifact_bp": 0,
        "is_damaged": False,
    }
    assert got[6]["n_control"] == 0  # tab/newline are not artifacts


def _div_reference(texts_a, texts_b):
    def toks(t):
        n = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        return n.split(" ") if n else []

    ca = Counter(w for t in texts_a for w in toks(t))
    cb = Counter(w for t in texts_b for w in toks(t))
    vocab = sorted(set(ca) | set(cb))
    v = len(vocab)
    ta, tb = sum(ca.values()), sum(cb.values())
    da, db = ta + v, tb + v

    def lnu(x):
        return math.floor(math.log(x) * 1e6 + 0.5)

    kl_ab = kl_ba = js_a = js_b = 0
    for w in vocab:
        na, nb = ca.get(w, 0) + 1, cb.get(w, 0) + 1
        ln_ab = lnu(na) - lnu(da) - lnu(nb) + lnu(db)
        mnum = na * db + nb * da
        ln_am = lnu(na) - lnu(da) - lnu(mnum) + lnu(2 * da * db)
        ln_bm = lnu(nb) - lnu(db) - lnu(mnum) + lnu(2 * da * db)
        kl_ab += na * ln_ab
        kl_ba += nb * -ln_ab
        js_a += na * ln_am
        js_b += nb * ln_bm
    return {
        "vocab_union": v, "tokens_a": ta, "tokens_b": tb,
        "kl_ab": round(kl_ab / da / 1e6, 6),
        "kl_ba": round(kl_ba / db / 1e6, 6),
        "js": round((js_a / da + js_b / db) / 2 / 1e6, 6),
    }


def test_vocab_divergence_matches_python_reference(spark):
    a = ["the cat sat", "a dog ran fast", "the weather is nice"]
    b = ["stock market crash", "the market fell", "prices are the problem"]
    got = vocab_divergence(
        spark.createDataFrame(list(enumerate(a)), ["doc_id", "text"]),
        spark.createDataFrame(list(enumerate(b)), ["doc_id", "text"]),
    ).collect()[0].asDict()
    assert got == _div_reference(a, b)


def test_vocab_divergence_identical_corpora_near_zero(spark):
    a = ["alpha beta gamma delta"] * 3
    df = spark.createDataFrame(list(enumerate(a)), ["doc_id", "text"])
    row = vocab_divergence(df, df).collect()[0]
    # identical distributions: KL and JS are 0 up to micro-nat snapping
    assert abs(row["kl_ab"]) < 1e-4
    assert abs(row["kl_ba"]) < 1e-4
    assert abs(row["js"]) < 1e-4
    # and JS is bounded by ln 2 for ANY pair
    assert row["js"] <= math.log(2) + 1e-6


def test_vocab_divergence_asymmetry_and_empty(spark):
    a = spark.createDataFrame([(1, "x x x x x y")], ["doc_id", "text"])
    b = spark.createDataFrame([(1, "y y y y y x")], ["doc_id", "text"])
    row = vocab_divergence(a, b).collect()[0]
    ref = _div_reference(["x x x x x y"], ["y y y y y x"])
    assert row["kl_ab"] == ref["kl_ab"] and row["kl_ba"] == ref["kl_ba"]

    empty = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    erow = vocab_divergence(empty, empty).collect()[0]
    assert (erow["vocab_union"], erow["tokens_a"], erow["tokens_b"]) == (0, 0, 0)
