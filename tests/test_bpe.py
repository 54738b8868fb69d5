"""BPE tokenizer induction: differential-tested against a pure-Python
reference implementation of Sennrich-style BPE."""

from __future__ import annotations

import re
from collections import Counter

import pytest

_EOW = "</w>"


def _py_norm_words(texts: list[str]) -> list[str]:
    out = []
    for t in texts:
        norm = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        if norm:
            out.extend(norm.split(" "))
    return out


def _py_merge(symbols: list[str], left: str, right: str) -> list[str]:
    acc: list[str] = []
    for s in symbols:
        if acc and acc[-1] == left and s == right:
            acc[-1] = left + right
        else:
            acc.append(s)
    return acc


def _py_bpe_train(texts: list[str], n_merges: int, min_pair_count: int = 2):
    vocab = Counter(_py_norm_words(texts))
    words = {w: list(w) + [_EOW] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            syms = words[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # (count desc, left asc, right asc)
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        words = {w: _py_merge(s, left, right) for w, s in words.items()}
    return merges


def _py_bpe_encode(text: str, merges) -> list[str]:
    toks = []
    for w in _py_norm_words([text]):
        syms = list(w) + [_EOW]
        for rule in merges:
            syms = _py_merge(syms, rule[0], rule[1])
        toks.extend(syms)
    return toks


CORPUS = [
    "the cat sat on the mat",
    "the cats chatter in the shade",
    "that chat was the best chat",
    "matter of the shattered hat",
    "the the the thematic theme",
]


def test_bpe_train_matches_python_reference(spark):
    from aces_spark.datapipe.bpe import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=12, min_pair_count=2)
    want = _py_bpe_train(CORPUS, n_merges=12, min_pair_count=2)
    assert got == want
    # sanity: ('a','t') and ('t','h') tie at count 12 → left-asc tie-break
    assert got[0][:2] == ("a", "t")
    assert any(left + right == "the" + _EOW for left, right, _ in got)


def test_bpe_encode_matches_python_reference(spark):
    from aces_spark.datapipe.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=8)
    docs = spark.createDataFrame(
        [(1, "the cat chatted"), (2, "shattered theme hat")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in [(1, "the cat chatted"), (2, "shattered theme hat")]:
        want = _py_bpe_encode(text, merges)
        assert list(out[doc_id]["tokens"]) == want
        assert out[doc_id]["n_tokens"] == len(want)


def test_bpe_early_stop_and_validation(spark):
    from aces_spark.datapipe.bpe import bpe_train

    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair is a hapax → min_pair_count=2 stops immediately
    assert bpe_train(df, n_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


def test_bpe_encode_keeps_empty_documents(spark):
    from aces_spark.datapipe.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "!!!")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, []).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and list(out[2]["tokens"]) == []
    assert out[3]["n_tokens"] == 0
    assert out[1]["n_tokens"] == len("hello") + 1  # chars + </w>
