"""Round-9 operator tests: substring_strip_exact (the ExactSubstr
variant added after tools/substr_gap_probe.py measured the windowed
operator's 6.1% recall on offset-misaligned duplicates)."""

from __future__ import annotations

import hashlib
import random

import pytest

from aces_spark.datapipe.dedup import substring_strip, substring_strip_exact


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz 0123456789") for _ in range(n))


def test_misaligned_cross_doc_duplicate_removed(spark):
    rng = random.Random(5)
    snip = _rand_text(rng, 72)
    docs = [
        (1, "aaa" + snip + _rand_text(rng, 40)),
        (2, "bbbbbbb" + snip + _rand_text(rng, 40)),  # different phase
        (3, _rand_text(rng, 80)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_strip_exact(df, min_len=50).collect()}
    assert out[1]["n_chars_removed"] == len(snip)
    assert out[2]["n_chars_removed"] == len(snip)
    assert out[1]["text_clean"] == "aaa" + docs[0][1][3 + len(snip):]
    assert out[2]["text_clean"] == "bbbbbbb" + docs[1][1][7 + len(snip):]
    assert out[3]["n_chars_removed"] == 0
    assert out[3]["text_clean"] == docs[2][1]
    # the windowed sibling misses this phase-shifted copy entirely
    w = {r["doc_id"]: r for r in substring_strip(df).collect()}
    assert w[1]["n_chars_removed"] == 0 and w[2]["n_chars_removed"] == 0


def test_min_len_floor_is_sharp(spark):
    rng = random.Random(6)
    dup49 = _rand_text(rng, 49)
    dup50 = _rand_text(rng, 50)
    # boundary chars pinned distinct so the shared run is EXACTLY 50:
    # doc1 precedes dup50 with 'q', doc2 with 'y'; dup50 ends doc1
    docs = [
        (1, dup49 + "x" + _rand_text(rng, 30) + "q" + dup50),
        (2, _rand_text(rng, 20) + dup49 + "y" + dup50 + _rand_text(rng, 10)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_strip_exact(df, min_len=50).collect()}
    # only the 50-char run is duplicated at >= min_len
    assert out[1]["n_chars_removed"] == 50
    assert out[2]["n_chars_removed"] == 50
    assert dup49 in out[1]["text_clean"] and dup49 in out[2]["text_clean"]


def test_within_doc_and_self_overlapping_runs(spark):
    rng = random.Random(7)
    snip = _rand_text(rng, 60)
    docs = [
        (1, snip + _rand_text(rng, 25) + snip),  # twice in ONE doc
        (2, "a" * 120 + _rand_text(rng, 30)),    # self-overlapping run
        (3, "a" * 120 + _rand_text(rng, 30)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_strip_exact(df, min_len=50).collect()}
    assert out[1]["n_chars_removed"] == 2 * len(snip)
    assert out[2]["n_chars_removed"] == 120
    assert out[3]["n_chars_removed"] == 120


def test_short_and_untouched_docs_byte_identical(spark):
    docs = [(1, "short"), (2, ""), (3, "x" * 49)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_strip_exact(df, min_len=50).collect()}
    for d, t in docs:
        assert out[d]["text_clean"] == t
        assert out[d]["n_spans"] == 0 and out[d]["n_chars_removed"] == 0


def test_python_differential_random_plants(spark):
    # engine vs an independent per-position gram reference on a messy
    # planted corpus (overlapping plants, edge-of-doc plants)
    rng = random.Random(11)
    docs = {i: _rand_text(rng, rng.randint(60, 300)) for i in range(40)}
    for ln in (50, 64, 90, 130):
        snip = _rand_text(rng, ln)
        for _ in range(rng.randint(2, 3)):
            d = rng.randrange(40)
            off = rng.randrange(len(docs[d]) + 1)
            docs[d] = docs[d][:off] + snip + docs[d][off:]
    L = 50
    occ: dict[str, int] = {}
    for t in docs.values():
        for i in range(len(t) - L + 1):
            g = t[i : i + L]
            occ[g] = occ.get(g, 0) + 1
    expect = {}
    for d, t in docs.items():
        mask = set()
        for i in range(len(t) - L + 1):
            if occ[t[i : i + L]] >= 2:
                mask.update(range(i, i + L))
        # splice = keep chars not in mask, in order
        expect[d] = (
            "".join(ch for j, ch in enumerate(t) if j not in mask),
            len(mask),
        )
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_strip_exact(df, min_len=L).collect()}
    for d in docs:
        assert out[d]["text_clean"] == expect[d][0], d
        assert out[d]["n_chars_removed"] == expect[d][1], d
        assert len(out[d]["text_clean"]) == len(docs[d]) - out[d]["n_chars_removed"]


def test_partition_invariance(spark):
    rng = random.Random(13)
    snip = _rand_text(rng, 80)
    rows = [(i, _rand_text(rng, 100) + (snip if i % 3 == 0 else "")) for i in range(30)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    a = sorted(tuple(r) for r in substring_strip_exact(df1).collect())
    b = sorted(tuple(r) for r in substring_strip_exact(df8).collect())
    assert a == b


def test_validation():
    with pytest.raises(ValueError):
        substring_strip_exact(None, min_len=0)


# ------------------------------------------------------- blocklist (r9)

from aces_spark.datapipe.blocklist import (  # noqa: E402
    blocklist_filter,
    blocklist_hits,
    normalize_phrases,
)


def test_blocklist_overlaps_boundaries_normalization(spark):
    docs = spark.createDataFrame(
        [
            (1, "the slow join ran and the Slow-Join ran again"),
            (2, "batch batch batch batch"),
            (3, "clean text with nothing bad"),
            (4, "slow joint is not a slow join"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["n_phrases"])
           for r in blocklist_hits(docs, ["slow join", "batch batch"]).collect()}
    assert got == {1: (2, 1), 2: (3, 1), 4: (1, 1)}  # overlaps count; 3 absent
    kept = blocklist_filter(docs, ["slow join", "batch batch"]).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in kept] == [(3, 0)]
    soft = blocklist_filter(docs, ["slow join", "batch batch"], max_hits=1)
    assert sorted(r["doc_id"] for r in soft.collect()) == [3, 4]


def test_blocklist_stopword_phrase_anchors_on_rare_token(spark):
    # "the" floods the corpus; the anchor election must pick "zzyzx"
    # (occ 1) so the candidate set is 1 row, and the match still lands
    docs = spark.createDataFrame(
        [(i, "the word the word the") for i in range(20)]
        + [(99, "the zzyzx the end")],
        "doc_id long, text string",
    )
    got = blocklist_hits(docs, ["the zzyzx"]).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in got] == [(99, 1)]


def test_blocklist_absent_phrase_and_validation(spark):
    docs = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    assert blocklist_hits(docs, ["not in corpus at all"]).count() == 0
    import pytest as pt

    with pt.raises(ValueError):
        normalize_phrases(["!!!", "  "])
    assert normalize_phrases(["Bad-Word!", "ok"]) == [["bad", "word"], ["ok"]]


def test_blocklist_python_differential(spark):
    import random

    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "run"]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60)))
        for i in range(60)
    }
    phrases = ["alpha beta", "the the", "gamma", "beta gamma delta"]
    expect = {}
    for d, t in docs.items():
        toks = t.split()
        n_hits, pids = 0, set()
        for pid, p in enumerate(x.split() for x in phrases):
            for s in range(len(toks) - len(p) + 1):
                if toks[s : s + len(p)] == p:
                    n_hits += 1
                    pids.add(pid)
        if n_hits:
            expect[d] = (n_hits, len(pids))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["n_phrases"])
           for r in blocklist_hits(df, phrases).collect()}
    assert got == expect


# ------------------------------------------------------------ HITS (r9)

from aces_spark.operators.graph import hits  # noqa: E402


def test_hits_matches_python_integer_reference(spark):
    edges = [("u1", "i1"), ("u1", "i2"), ("u2", "i1"), ("u3", "i1"),
             ("u4", "i3"), ("u2", "i2")]
    scale, iters = 10**12, 3
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    target = len(nodes) * scale

    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(iters):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += hub[s]
        t = sum(raw.values())
        auth = {n: (raw[n] * target) // t if raw[n] else 0 for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += auth[d]
        t = sum(raw.values())
        hub = {n: (raw[n] * target) // t if raw[n] else 0 for n in nodes}

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub_u"], r["auth_u"])
           for r in hits(df, iterations=iters).collect()}
    assert got == {n: (hub[n], auth[n]) for n in nodes}
    # the mutual-reinforcement ranking: i1 (3 links incl. the 2 best
    # hubs) > i2 > i3; u1/u2 (2 links each to top items) > u3 > u4
    assert got["i1"][1] > got["i2"][1] > got["i3"][1]
    assert got["u1"][0] > got["u3"][0] > got["u4"][0]


def test_hits_duplicate_edges_collapse_and_partition_invariance(spark):
    edges = [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y")]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = sorted(tuple(r) for r in hits(df1, iterations=2).collect())
    r8 = sorted(tuple(r) for r in hits(df8, iterations=2).collect())
    assert r1 == r8
    dedup = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y")], "src string, dst string"
    )
    assert r1 == sorted(tuple(r) for r in hits(dedup, iterations=2).collect())


def test_hits_validation(spark):
    import pytest as pt

    df = spark.createDataFrame([], "src string, dst string")
    with pt.raises(ValueError):
        hits(df)
    with pt.raises(ValueError):
        hits(df, iterations=0)


# ------------------------------------------------- Dirichlet QL (r9)

from aces_spark.datapipe.retrieval import dirichlet_ql_scores  # noqa: E402


def test_dirichlet_ql_matches_python_reference(spark):
    import math

    docs = {
        1: "spark join window spark",
        2: "join filter table",
        3: "window window window group",
        4: "nothing relevant here",
    }
    terms = ["spark", "window"]
    mu = 100
    tok = {d: t.split() for d, t in docs.items()}
    c_total = sum(len(t) for t in tok.values())
    cf = {q: sum(t.count(q) for t in tok.values()) for q in terms}
    expect = {}
    for d, t in tok.items():
        tfs = {q: t.count(q) for q in terms}
        if not any(tfs.values()):
            continue
        u6 = 0
        for q in terms:
            num = tfs[q] * c_total + mu * cf[q]
            den = (len(t) + mu) * c_total
            u6 += math.floor((math.log(num) - math.log(den)) * 1e6 + 0.5)
        expect[d] = (sum(1 for v in tfs.values() if v), u6 / 1e6)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_matched_terms"], r["score"])
           for r in dirichlet_ql_scores(df, terms, mu=mu).collect()}
    assert got == expect
    # docs 2 and 4 (no query term) are not candidates
    assert 2 not in got and 4 not in got
    # ranking sanity: doc1 (both terms) beats doc3 (one term, longer)
    assert got[1][1] > got[3][1]


def test_dirichlet_ql_zero_cf_term_dropped_and_topk(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark"), (2, "spark join"), (3, "join join")],
        "doc_id long, text string",
    )
    # "zzz" has cf=0 — dropped, not NaN/-inf
    r = dirichlet_ql_scores(docs, ["spark", "zzz"], mu=50).collect()
    assert all(not (row["score"] != row["score"]) for row in r)  # no NaN
    top = dirichlet_ql_scores(docs, ["spark"], mu=50, top_k=1).collect()
    assert [row["doc_id"] for row in top] == [1]


def test_dirichlet_ql_validation(spark):
    import pytest as pt

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pt.raises(ValueError):
        dirichlet_ql_scores(df, [])
    with pt.raises(ValueError):
        dirichlet_ql_scores(df, ["x"], mu=0)


# ----------------------------------------------- negative sampling (r9)

from aces_spark.datapipe.sampling import negative_samples  # noqa: E402


def test_negative_samples_deterministic_and_distribution(spark):
    rows = [(u, "a") for u in range(40)] + [(u, "b") for u in range(10)] \
        + [(u, "c") for u in range(2)]
    pos = spark.createDataFrame(rows, "user_id long, item string")
    out = negative_samples(pos, k=4, item_col="item")
    got = sorted(tuple(r) for r in out.collect())
    assert len(got) == 52 * 4
    again = sorted(tuple(r) for r in negative_samples(pos, k=4, item_col="item").collect())
    assert got == again  # pure function of the data
    # smoothed-frequency marginal: 'a' (40) drawn most, 'c' (2) least,
    # but c^(3/4) smoothing keeps 'c' present
    from collections import Counter

    freq = Counter(r[3] for r in got)
    assert freq["a"] > freq["b"] > freq["c"] > 0


def test_negative_samples_matches_python_reference(spark):
    import hashlib
    import math

    rows = [(1, "x"), (1, "y"), (2, "x"), (3, "z"), (3, "x")]
    pos = spark.createDataFrame(rows, "user_id long, item string")
    counts = {"x": 3, "y": 1, "z": 1}
    w = {
        i: math.floor(math.sqrt(c) * math.sqrt(math.sqrt(c)) * 1e6 + 0.5)
        for i, c in counts.items()
    }
    items = sorted(w)
    cum, lo = {}, 0
    for i in items:
        cum[i] = (lo, lo + w[i])
        lo += w[i]
    total = lo

    def draw(u, it, j):
        h = hashlib.md5(f"{u}:{it}:{j}".encode()).hexdigest()
        t = int(h[:15], 16) % total
        for i in items:
            if cum[i][0] <= t < cum[i][1]:
                return i

    expect = sorted(
        (u, it, j, draw(u, it, j)) for u, it in rows for j in (1, 2)
    )
    got = sorted(
        tuple(r) for r in negative_samples(pos, k=2, item_col="item").collect()
    )
    assert got == expect


def test_negative_samples_validation(spark):
    import pytest as pt

    pos = spark.createDataFrame([(1, "a")], "user_id long, item string")
    with pt.raises(ValueError):
        negative_samples(pos, k=0)
    with pt.raises(ValueError):
        negative_samples(pos, smoothing="pow99")
