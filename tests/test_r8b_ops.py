"""Round-8 second-wave operator tests: PII density gate, Bradley-Terry
preference fitting, fuzzy (MinHash-LSH) decontamination."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from aces_spark.datapipe.pii import pii_density_filter
from aces_spark.datapipe.preference import SCALE, bradley_terry_scores
from aces_spark.datapipe.decontam import fuzzy_decontaminate


# ---------------------------------------------------------------- pii

def test_pii_density_filter_drops_dense_keeps_light(spark):
    light = "a perfectly ordinary paragraph " * 40 + "mail me at bob@x.org ok"
    dense = " ".join(f"u{i}@corp.example.com 555-123-{1000 + i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, light), (2, dense), (3, ""), (4, "no pii here at all")],
        "doc_id long, text string",
    )
    out = pii_density_filter(df, max_per_kchar=5.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3, 4}  # dense address-book doc dropped
    assert "<EMAIL>" in rows[1]["clean_text"]
    assert rows[1]["n_pii"] == 1
    assert rows[3]["n_pii"] == 0 and rows[3]["pii_per_kchar_tenths"] == 0
    assert rows[4]["clean_text"] == "no pii here at all"


def test_pii_density_filter_boundary_exact(spark):
    # 2 matches in exactly 400 chars -> 2*10000 div 400 = 50 tenths = 5.0
    # per kchar: AT the threshold keeps; truncating div stays at 50 down
    # to 393 chars (20000 div 393 = 50), so drop needs <= 392
    body = "x" * (400 - len("a@b.co") * 2 - 2) + " "
    text_at = body + "a@b.co " + "a@b.co"
    assert len(text_at) == 400
    df = spark.createDataFrame(
        [(1, text_at), (2, text_at[8:])], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pii_density_filter(df, 5.0).collect()}
    assert 1 in out and out[1]["pii_per_kchar_tenths"] == 50
    assert 2 not in out


# ---------------------------------------------------------- bradley-terry

def _bt_reference(comparisons, n_iters):
    """Pure-python mirror of the integer MM discipline."""
    directed = {}
    for w, l in comparisons:
        if w != l:
            directed[(w, l)] = directed.get((w, l), 0) + 1
    games = {}
    for (w, l), n in directed.items():
        games[(w, l)] = games.get((w, l), 0) + n
        games[(l, w)] = games.get((l, w), 0) + n
    players = sorted({i for i, _ in games})
    wins = {p: 0 for p in players}
    for (w, _), n in directed.items():
        wins[w] += n
    target = len(players) * SCALE
    u = {p: SCALE for p in players}
    for _ in range(n_iters):
        denom = {p: 0 for p in players}
        for (i, j), n in games.items():
            denom[i] += (n * SCALE * SCALE) // (u[i] + u[j])
        raw = {
            p: (wins[p] * SCALE * SCALE) // max(denom[p], 1) for p in players
        }
        s = max(sum(raw.values()), 1)
        u = {p: max((raw[p] * target) // s, 1) for p in players}
    return u, wins


def test_bradley_terry_matches_python_reference(spark):
    # deterministic synthetic tournament: strength ladder a > b > c > d,
    # winner decided by a fixed schedule with some upsets
    comps = []
    ladder = ["a", "b", "c", "d"]
    k = 0
    for rep in range(12):
        for x in range(4):
            for y in range(x + 1, 4):
                k += 1
                # upset every 5th game
                if k % 5 == 0:
                    comps.append((ladder[y], ladder[x]))
                else:
                    comps.append((ladder[x], ladder[y]))
    df = spark.createDataFrame(comps, "winner string, loser string")
    got = {
        r["player"]: (r["strength_micro"], r["wins"], r["games"])
        for r in bradley_terry_scores(df, n_iters=3).collect()
    }
    exp_u, exp_wins = _bt_reference(comps, 3)
    assert {p: v[0] for p, v in got.items()} == exp_u
    assert {p: v[1] for p, v in got.items()} == exp_wins
    # ladder order survives the upsets
    assert got["a"][0] > got["b"][0] > got["c"][0] > got["d"][0]
    # normalization: strengths sum to ~n_players * SCALE (floor slack)
    assert abs(sum(v[0] for v in got.values()) - 4 * SCALE) <= 4


def test_bradley_terry_partition_invariance(spark):
    comps = [("a", "b")] * 7 + [("b", "a")] * 3 + [("b", "c")] * 5 + [("c", "a")] * 2
    df = spark.createDataFrame(comps, "winner string, loser string")
    one = {
        (r["player"], r["strength_micro"])
        for r in bradley_terry_scores(df.coalesce(1), n_iters=3).collect()
    }
    many = {
        (r["player"], r["strength_micro"])
        for r in bradley_terry_scores(df.repartition(13), n_iters=3).collect()
    }
    assert one == many


def test_bradley_terry_self_pairs_ignored_and_validation(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "b")], "winner string, loser string"
    )
    rows = {r["player"]: r for r in bradley_terry_scores(df, n_iters=2).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["wins"] == 2 and rows["b"]["wins"] == 0
    assert rows["a"]["strength_micro"] > rows["b"]["strength_micro"]
    assert rows["b"]["strength_micro"] >= 1  # floor, not zero
    with pytest.raises(ValueError):
        bradley_terry_scores(df, n_iters=0)


# ------------------------------------------------------- fuzzy decontam

def test_fuzzy_decontaminate_catches_paraphrase_misses_unrelated(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "jackdaws observe quietly from the old stone wall nearby today"
    )
    corpus = spark.createDataFrame(
        [
            (1, base),  # near-identical to benchmark doc 100
            (2, base.replace("today", "tomorrow morning")),  # light edit
            (3, "completely different text about spark shuffle partitions "
                "and adaptive query execution at terabyte scale"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, base)], "bench_id long, text string"
    )
    got = {
        (r["doc_id"], r["bench_id"])
        for r in fuzzy_decontaminate(corpus, bench, n=3, num_hashes=8, bands=4).collect()
    }
    assert (1, 100) in got
    assert (2, 100) in got  # the paraphrase the exact rule would keep
    assert all(d != 3 for d, _ in got)


def test_fuzzy_decontaminate_benchmark_broadcast_plan(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} with words {i % 7} {i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "doc number 0 with words 0 0")], "bench_id long, text string"
    )
    out = fuzzy_decontaminate(corpus, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    with pytest.raises(ValueError):
        fuzzy_decontaminate(corpus, bench, num_hashes=8, bands=3)


# ------------------------------------------------------------- pca

def _cov_reference(vecs):
    import numpy as np

    u = np.floor(np.asarray(vecs, dtype=np.float64) * 1_000_000 + 0.5).astype(object)
    n, d = u.shape
    out = {}
    for i in range(d):
        for j in range(i, d):
            si = int(sum(u[:, i]))
            sj = int(sum(u[:, j]))
            sij = int(sum(int(a) * int(b) for a, b in zip(u[:, i], u[:, j])))
            num = n * sij - si * sj
            q = abs(num) // (n * n)
            out[(i + 1, j + 1)] = (n, si, sj, sij, q if num >= 0 else -q)
    return out


def test_embedding_covariance_matches_integer_reference(spark):
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(5)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # reference must see the SAME float32-rounded coordinates Spark reads
    import numpy as np

    vecs32 = np.asarray(vecs, dtype=np.float32)
    from aces_spark.datapipe.pca import embedding_covariance

    got = {
        (r["i"], r["j"]): (r["n"], r["sum_ui"], r["sum_uj"], r["sum_uiuj"], r["cov_q"])
        for r in embedding_covariance(df).collect()
    }
    assert got == _cov_reference(vecs32)


def test_embedding_covariance_partition_invariant(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [float(rng.uniform(-2, 2)) for _ in range(4)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from aces_spark.datapipe.pca import embedding_covariance

    one = sorted(map(tuple, embedding_covariance(df.coalesce(1)).collect()))
    many = sorted(map(tuple, embedding_covariance(df.repartition(17)).collect()))
    assert one == many


def test_pca_whiten_identity_covariance_and_validation(spark):
    import numpy as np
    import pytest as _pytest

    rng = np.random.default_rng(11)
    # correlated 3-dim data embedded in 6 dims
    base = rng.normal(size=(500, 3))
    mix = np.array(
        [[1.0, 0.5, 0.0, 0.2, 0.0, 0.1],
         [0.0, 1.0, 0.7, 0.0, 0.3, 0.0],
         [0.2, 0.0, 0.1, 1.0, 0.0, 0.6]]
    )
    data = (base @ mix).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    from aces_spark.datapipe.pca import pca_whiten, embedding_covariance

    out = pca_whiten(df, n_components=3)
    w = np.stack([np.array(r["whitened"]) for r in out.collect()])
    assert w.shape == (500, 3)
    cov = np.cov(w.T, bias=True)
    assert np.allclose(cov, np.eye(3), atol=0.05)

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        embedding_covariance(empty)


# ---------------------------------------------------- dim ablation

def test_dim_ablation_full_dim_is_perfect_recall(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [float(rng.uniform(-1, 1)) for _ in range(12)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from aces_spark.datapipe.similarity import dim_ablation_recall

    out = {
        r["dim"]: r
        for r in dim_ablation_recall(
            df, df.filter(F.col("vec_id") < 4), dims=[4, 12], k=5
        ).collect()
    }
    assert out[12]["recall_bp"] == 10000  # truncating at full dim = ground truth
    assert out[12]["n_hits"] == out[12]["n_queries"] * 5
    assert 0 <= out[4]["recall_bp"] <= 10000
    assert out[4]["n_queries"] == 4


def test_dim_ablation_validation(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    from aces_spark.datapipe.similarity import dim_ablation_recall

    with pytest.raises(ValueError):
        dim_ablation_recall(df, df, dims=[])
    with pytest.raises(ValueError):
        dim_ablation_recall(df, df, dims=[0, 2])


# ------------------------------------------------------ welch t-test

def _welch_reference(xs, ys):
    import math

    def mom(v):
        u = [math.floor(x * 1_000_000 + 0.5) for x in v]
        return len(u), float(sum(u)), float(
            len(u) * sum(a * a for a in u) - sum(u) ** 2
        )

    na, s1a, va_num = mom(xs)
    nb, s1b, vb_num = mom(ys)
    ma, mb = s1a / na / 1e6, s1b / nb / 1e6
    se2a = va_num / na / (na - 1) / 1e12 / na
    se2b = vb_num / nb / (nb - 1) / 1e12 / nb
    t = (ma - mb) / math.sqrt(se2a + se2b)
    nu = (se2a + se2b) ** 2 / (se2a**2 / (na - 1) + se2b**2 / (nb - 1))
    return round(ma, 6), round(mb, 6), round(t, 4), round(nu, 2)


def test_ab_welch_matches_reference_and_direction(spark):
    from aces_spark.datapipe.analytics import ab_welch_ttest

    xs = [10.0 + 0.1 * i for i in range(30)]       # control, higher mean
    ys = [9.0 + 0.05 * i for i in range(50)]       # treatment
    rows = [("a", float(x)) for x in xs] + [("b", float(y)) for y in ys]
    df = spark.createDataFrame(rows, "variant string, value double")
    r = ab_welch_ttest(df).collect()
    assert len(r) == 1
    row = r[0]
    ma, mb, t, nu = _welch_reference(xs, ys)
    assert (row["variant_a"], row["variant_b"]) == ("a", "b")
    assert (row["n_a"], row["n_b"]) == (30, 50)
    assert float(row["mean_a"]) == ma and float(row["mean_b"]) == mb
    assert float(row["t_stat"]) == t
    assert float(row["welch_df"]) == nu
    assert row["t_stat"] > 0  # a's mean is higher


def test_ab_welch_multi_variant_pairwise_and_nulls(spark):
    from aces_spark.datapipe.analytics import ab_welch_ttest

    rows = (
        [("a", float(i)) for i in range(10)]
        + [("b", float(i * 2)) for i in range(10)]
        + [("c", float(i * 3)) for i in range(10)]
        + [("a", None)]
    )
    df = spark.createDataFrame(rows, "variant string, value double")
    got = {
        (r["variant_a"], r["variant_b"]): r for r in ab_welch_ttest(df).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")]["n_a"] == 10  # null metric row excluded


# --------------------------------------------------------------- oov

def test_oov_rate_counts_and_boundary(spark):
    from aces_spark.datapipe.text import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # 2 of 4 OOV
            (2, "alpha alpha beta"),          # 0 OOV
            (3, "zeta zeta zeta"),            # all OOV
            (4, ""),                          # empty: absent
            (5, "...!!!"),                    # punctuation-only: absent
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("alpha",), ("beta",)], "word string"
    )
    rows = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_tokens"], rows[1]["n_oov"], rows[1]["oov_bp"]) == (4, 2, 5000)
    assert (rows[2]["n_oov"], rows[2]["oov_bp"]) == (0, 0)
    assert (rows[3]["n_oov"], rows[3]["oov_bp"]) == (3, 10000)


def test_oov_rate_vocab_broadcast_plan(spark):
    from aces_spark.datapipe.text import oov_rate

    docs = spark.createDataFrame(
        [(i, f"word{i % 13} word{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([(f"word{i}",) for i in range(7)], "word string")
    plan = oov_rate(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
