"""Bigram LM scoring and SCD2 change merge."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from conftest import ts


# ------------------------------------------------------------- bigram LM

@pytest.fixture(scope="module")
def lm_model(spark):
    from aces_spark.datapipe.lm import train_bigram_lm

    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat"),
        ],
        "doc_id long, text string",
    )
    return train_bigram_lm(corpus)


def test_train_bigram_counts(lm_model):
    bg = {
        (r["prev"], r["word"]): r["c_bg"] for r in lm_model["bigrams"].collect()
    }
    # "the cat" appears in docs 1 and 2
    assert bg[("the", "cat")] == 2
    # sentence-start sentinel: docs 1 and 2 open with "the"
    assert bg[("<s>", "the")] == 2
    uni = {r["prev"]: r["c_prev"] for r in lm_model["unigrams"].collect()}
    # 'the' is the context of: the→cat, the→mat (doc 1), the→cat (doc 2)
    assert uni["the"] == 3
    assert lm_model["vocab"].collect()[0]["v_size"] == 8


def test_score_documents_lm_reference(spark, lm_model):
    """Hand-computed NLL for a two-token doc pins the smoothing formula."""
    from aces_spark.datapipe.lm import score_documents_lm

    doc = spark.createDataFrame([(10, "the cat")], "doc_id long, text string")
    out = score_documents_lm(doc, lm_model).collect()[0]
    assert out["n_tokens"] == 2
    v = 8
    p1 = (2 + 1) / (3 + v)  # <s> -> the: c_bg=2, c_prev=3 starts
    p2 = (2 + 1) / (3 + v)  # the -> cat: c_bg=2, c_prev=3
    u1 = math.floor(-math.log(p1) * 1e6 + 0.5)
    u2 = math.floor(-math.log(p2) * 1e6 + 0.5)
    expected = math.floor((u1 + u2) / 2 / 1e6 * 1e6 + 0.5) / 1e6
    assert out["nll"] == expected


def test_score_unseen_tokens_degrade_not_drop(spark, lm_model):
    from aces_spark.datapipe.lm import score_documents_lm

    doc = spark.createDataFrame(
        [(11, "zebra quantum flux")], "doc_id long, text string"
    )
    out = score_documents_lm(doc, lm_model).collect()[0]
    # all three tokens scored (unseen → smoothed floor), none dropped
    assert out["n_tokens"] == 3
    # unseen text must score WORSE (higher nll) than in-corpus text
    seen = spark.createDataFrame([(12, "the cat sat")], "doc_id long, text string")
    seen_out = score_documents_lm(seen, lm_model).collect()[0]
    assert out["nll"] > seen_out["nll"]


# ------------------------------------------------------------ SCD2 merge

@pytest.fixture()
def history(spark):
    return spark.createDataFrame(
        [
            (1, "alice", ts("2024-01-01"), ts("2024-02-01")),
            (1, "alicia", ts("2024-02-01"), None),
            (2, "bob", ts("2024-01-01"), None),
        ],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_insert_update_chain(spark, history):
    from aces_spark.datapipe.cdc import scd2_merge

    changes = spark.createDataFrame(
        [
            (1, "alyce", ts("2024-03-01")),   # update key 1
            (3, "carol", ts("2024-03-15")),   # brand-new key
            (3, "carole", ts("2024-04-01")),  # chained second change
        ],
        "id long, name string, effective_from timestamp",
    )
    out = scd2_merge(history, changes, "id")
    rows = {(r["id"], r["name"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    # old current version of key 1 closed at the change's effective time
    assert rows[(1, "alicia")] == (ts("2024-02-01"), ts("2024-03-01"))
    assert rows[(1, "alyce")] == (ts("2024-03-01"), None)
    # untouched key passes through open
    assert rows[(2, "bob")] == (ts("2024-01-01"), None)
    # chained inserts close each other in order
    assert rows[(3, "carol")] == (ts("2024-03-15"), ts("2024-04-01"))
    assert rows[(3, "carole")] == (ts("2024-04-01"), None)
    # closed historical version untouched
    assert rows[(1, "alice")] == (ts("2024-01-01"), ts("2024-02-01"))
    assert out.count() == 6


def test_scd2_same_instant_supersession(spark, history):
    from aces_spark.datapipe.cdc import scd2_merge

    changes = spark.createDataFrame(
        [(2, "robert", ts("2024-01-01"))],
        "id long, name string, effective_from timestamp",
    )
    out = scd2_merge(history, changes, "id")
    rows = {(r["id"], r["name"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    # the superseded same-instant version vanishes (empty half-open span)
    assert (2, "bob") not in rows
    assert rows[(2, "robert")] == (ts("2024-01-01"), None)


def test_scd2_validation(spark, history):
    from aces_spark.datapipe.cdc import scd2_merge

    bad = spark.createDataFrame([(1, ts("2024-03-01"))], "id long, effective_from timestamp")
    with pytest.raises(ValueError, match="payload"):
        scd2_merge(history, bad, "id")
    no_eff = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="effective_from"):
        scd2_merge(history, no_eff, "id")


def test_scd2_gap_preserved_on_mid_interval_replay(spark):
    """A late change inside a CLOSED interval inherits that interval's
    original endpoint — it must not extend validity across a deletion
    gap."""
    from aces_spark.datapipe.cdc import scd2_merge

    history = spark.createDataFrame(
        [
            (1, "a", ts("2024-01-01"), ts("2024-01-10")),  # then DELETED
            (1, "b", ts("2024-01-20"), None),              # re-inserted
        ],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "c", ts("2024-01-05"))],
        "id long, name string, effective_from timestamp",
    )
    rows = {
        r["name"]: (r["valid_from"], r["valid_to"])
        for r in scd2_merge(history, changes, "id").collect()
    }
    assert rows["a"] == (ts("2024-01-01"), ts("2024-01-05"))
    # bounded by the interval's ORIGINAL end, not by b's start
    assert rows["c"] == (ts("2024-01-05"), ts("2024-01-10"))
    assert rows["b"] == (ts("2024-01-20"), None)


def test_scd2_gap_change_is_reinsert(spark):
    from aces_spark.datapipe.cdc import scd2_merge

    history = spark.createDataFrame(
        [(1, "a", ts("2024-01-01"), ts("2024-01-10")),
         (1, "b", ts("2024-02-01"), None)],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "g", ts("2024-01-15"))],  # inside the gap
        "id long, name string, effective_from timestamp",
    )
    rows = {
        r["name"]: (r["valid_from"], r["valid_to"])
        for r in scd2_merge(history, changes, "id").collect()
    }
    assert rows["a"] == (ts("2024-01-01"), ts("2024-01-10"))  # untouched
    assert rows["g"] == (ts("2024-01-15"), ts("2024-02-01"))  # runs to b
    assert rows["b"] == (ts("2024-02-01"), None)


def test_scd2_same_instant_changes_resolve_by_change_order(spark, history):
    from aces_spark.datapipe.cdc import scd2_merge

    changes = spark.createDataFrame(
        [(2, "X", ts("2024-03-01"), 1), (2, "Y", ts("2024-03-01"), 2)],
        "id long, name string, effective_from timestamp, seq long",
    )
    # extra change columns (seq) beyond the history payload are ignored
    rows = {
        r["name"]: (r["valid_from"], r["valid_to"])
        for r in scd2_merge(history, changes, "id", change_order="seq").collect()
        if r["id"] == 2
    }
    # the largest change_order wins; the other collapses to an empty span
    assert "X" not in rows
    assert rows["Y"] == (ts("2024-03-01"), None)
    assert rows["bob"] == (ts("2024-01-01"), ts("2024-03-01"))


def test_score_lm_empty_model_raises(spark):
    from aces_spark.datapipe.lm import score_documents_lm, train_bigram_lm

    empty = spark.createDataFrame([(1, "!!!")], "doc_id long, text string")
    model = train_bigram_lm(empty)
    docs = spark.createDataFrame([(2, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty model"):
        score_documents_lm(docs, model)


# ------------------------------------------- perplexity buckets (CCNet)


def test_perplexity_buckets_per_group_ntile(spark, lm_model):
    from aces_spark.datapipe.lm import perplexity_buckets, score_documents_lm

    docs = spark.createDataFrame(
        [
            # domain a: 4 docs, increasingly unlike the reference corpus
            (10, "the cat sat", "a"),
            (11, "the cat ran", "a"),
            (12, "a dog sat on the mat", "a"),
            (13, "zebra quux flarp", "a"),
            # domain b: 2 docs
            (20, "the cat sat on the mat", "b"),
            (21, "xyzzy gorp", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = perplexity_buckets(docs, lm_model, by="source").collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {10, 11, 12, 13, 20, 21}
    # per-group cut: within each source, buckets follow the nll order
    # computed by the scorer itself
    scored = {
        r["doc_id"]: r["nll"]
        for r in score_documents_lm(docs, lm_model).collect()
    }
    a_sorted = sorted([10, 11, 12, 13], key=lambda d: (scored[d], d))
    # 4 rows, 3 buckets -> ANSI fill: first bucket gets 2 rows
    assert [rows[d]["bucket"] for d in a_sorted] == [1, 1, 2, 3]
    assert [rows[d]["band"] for d in a_sorted] == ["head", "head", "middle", "tail"]
    b_sorted = sorted([20, 21], key=lambda d: (scored[d], d))
    assert [rows[d]["bucket"] for d in b_sorted] == [1, 2]
    # the gibberish docs land in the worst band of their group
    assert rows[13]["band"] == "tail"
    # nll/n_tokens ride through unchanged from the scorer
    assert rows[20]["nll"] == scored[20]


def test_perplexity_buckets_global_and_validation(spark, lm_model):
    from aces_spark.datapipe.lm import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, "the cat sat" if i % 2 else "gorp flarp", "x") for i in range(6)],
        "doc_id long, text string, source string",
    )
    out = perplexity_buckets(docs, lm_model, by=None, n_buckets=2).collect()
    assert {r["bucket"] for r in out} == {1, 2}
    assert {r["band"] for r in out} == {"1", "2"}
    assert "source" not in out[0].asDict()
    with pytest.raises(ValueError):
        perplexity_buckets(docs, lm_model, n_buckets=1)


# ------------------------------------------------------------- Kneser-Ney


def _kn_reference(train_texts, score_docs):
    """Pure-python interpolated-KN mirror of train_kn_lm/score_documents_kn."""
    import math
    import re
    from collections import Counter, defaultdict

    def toks(t):
        n = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        return n.split(" ") if n else []

    c_bg = Counter()
    for t in train_texts:
        ws = toks(t)
        for p, w in zip(["<s>"] + ws[:-1], ws):
            c_bg[(p, w)] += 1
    c_prev, n_fol, n_pre = Counter(), Counter(), Counter()
    for (p, w), c in c_bg.items():
        c_prev[p] += c
        n_fol[p] += 1
        n_pre[w] += 1
    t_types = len(c_bg)
    v_size = len({w for _, w in c_bg})
    tv = t_types + v_size

    out = {}
    for doc_id, text in score_docs:
        ws = toks(text)
        if not ws:
            continue
        su = 0
        for p, w in zip(["<s>"] + ws[:-1], ws):
            np1 = n_pre.get(w, 0) + 1
            if p in c_prev:
                num = max(4 * c_bg.get((p, w), 0) - 3, 0) * tv + 3 * n_fol[p] * np1
                den = 4 * c_prev[p] * tv
            else:
                num, den = np1, tv
            su += math.floor((math.log(den) - math.log(num)) * 1e6 + 0.5)
        mean = su / len(ws) / 1e6
        out[doc_id] = (len(ws), math.floor(mean * 1e6 + 0.5) / 1e6)
    return out


def test_kn_matches_python_reference(spark):
    from aces_spark.datapipe.lm import score_documents_kn, train_kn_lm

    train = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "san francisco is foggy",
        "the fog in san francisco",
    ]
    score = [
        (1, "the cat sat on the log"),   # fluent
        (2, "francisco the the dog"),    # continuation test: bound word
        (3, "completely unseen tokens"), # OOV floor
        (4, "san francisco"),
    ]
    train_df = spark.createDataFrame(list(enumerate(train)), ["doc_id", "text"])
    score_df = spark.createDataFrame(score, ["doc_id", "text"])
    model = train_kn_lm(train_df)
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in score_documents_kn(score_df, model).collect()
    }
    model["bigrams"].unpersist()
    assert got == _kn_reference(train, score)


def test_kn_prefers_true_continuations_over_bound_words(spark):
    """The Kneser-Ney point: after an unseen context, a word that
    completes MANY contexts ('the'-like) outscores an equally frequent
    word that completes one ('francisco'-like)."""
    from aces_spark.datapipe.lm import score_documents_kn, train_kn_lm

    # 'end' follows 4 distinct contexts; 'bound' is as frequent but
    # always follows 'fixed'
    train = spark.createDataFrame(
        [
            (0, "alpha end"),
            (1, "beta end"),
            (2, "gamma end"),
            (3, "delta end"),
            (4, "fixed bound fixed bound fixed bound fixed bound"),
        ],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(10, "zzz end"), (11, "zzz bound")], ["doc_id", "text"]
    )
    model = train_kn_lm(train)
    nll = {
        r["doc_id"]: r["nll"] for r in score_documents_kn(score, model).collect()
    }
    model["bigrams"].unpersist()
    assert nll[10] < nll[11]


def test_kn_empty_model_raises(spark):
    from aces_spark.datapipe.lm import score_documents_kn, train_kn_lm

    empty = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    docs = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    model = train_kn_lm(empty, cache=False)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        score_documents_kn(docs, model)


def test_lm_save_load_roundtrip(spark, tmp_path):
    """Persisted model scores IDENTICALLY to the in-memory one, for both
    smoothing families; load_lm detects the family from the frame set."""
    from aces_spark.datapipe.lm import (
        load_lm,
        save_lm,
        score_documents_kn,
        score_documents_lm,
        train_bigram_lm,
        train_kn_lm,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a dog sat on a log")],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame([(9, "the dog sat")], ["doc_id", "text"])

    m1 = train_bigram_lm(train, cache=False)
    save_lm(m1, str(tmp_path / "addone"))
    l1 = load_lm(spark, str(tmp_path / "addone"))
    assert set(l1) == {"bigrams", "unigrams", "vocab"}
    assert (
        score_documents_lm(score, l1).collect()
        == score_documents_lm(score, m1).collect()
    )

    m2 = train_kn_lm(train, cache=False)
    save_lm(m2, str(tmp_path / "kn"))
    l2 = load_lm(spark, str(tmp_path / "kn"))
    assert set(l2) == {"bigrams", "contexts", "continuations", "totals"}
    assert (
        score_documents_kn(score, l2).collect()
        == score_documents_kn(score, m2).collect()
    )
