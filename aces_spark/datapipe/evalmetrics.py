"""Exact model-evaluation metrics over scored corpora (r10).

A training-data pipeline doesn't stop at producing examples — every
quality classifier, reranker, and dedup scorer it trains gets judged on
held-out scores, and those judgments (AUC, calibration, leakage-safe
target encodings, time-to-event profiles) are themselves large-scale
relational computations. This module keeps them EXACT and
engine-portable: rank statistics and bin counts stay in integer
arithmetic until one final correctly-rounded IEEE division, so a DuckDB
oracle and a 1000-executor Spark run hash-agree bit for bit.

Reference framing: the reference engine (justin13601/ACES) stops at
label extraction (``src/aces/query.py``); these operators are the
downstream-eval extension the task calls for, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_bucket_expr


def _round6(num: Column, den: Column) -> Column:
    """ROUND(num/den, 6) with the division done once in IEEE double —
    correctly rounded, hence engine-portable on exact integer inputs."""
    return F.round(num.cast("double") / den.cast("double"), 6)


def group_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_col: str | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank statistic.

    AUC equals the probability a random positive outscores a random
    negative (ties count half): ``U / (n_pos * n_neg)`` where ``U`` is
    the rank-sum statistic. Both the classic sklearn trapezoid and this
    rank form agree exactly; the rank form is ONE aggregation — no curve
    materialization — and stays in integers:

    * collapse to distinct scores per group (``cnt``, ``cnt_pos``);
    * a cumulative-count window over score order gives each tie-block's
      average rank: ``avg_rank = cum_before + (cnt + 1) / 2``;
    * ``2·U = Σ_blocks cnt_pos · (2·cum_before + cnt + 1) − 2·Σranks_min``
      — every term integral, so ``u2`` is an exact BIGINT and the only
      float op is the final division, correctly rounded then snapped to
      6 dp.

    Output: ``(group?, n_pos, n_neg, u2, auc)`` — ``u2 = 2·U`` kept so
    downstream can re-derive the exact rational. Groups with no
    positives or no negatives are dropped (AUC undefined).

    Scale shape: one partial-aggregated groupBy on (group, score) —
    distinct-score cardinality, not row count — then a per-group window
    over those distinct scores and one tiny final aggregate. The group
    key partitions everything; no broadcast, no skew beyond the group
    histogram itself.
    """
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]

    by_score = df.groupBy(*gcols, score_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("cnt_pos"),
    )
    w = (
        Window.partitionBy(*gpart)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = by_score.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn(
        "tie_contrib",
        F.col("cnt_pos") * (2 * F.col("cum_before") + F.col("cnt") + 1),
    )
    agg = contrib.groupBy(*gcols).agg(
        F.sum("cnt_pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("cnt_pos")).alias("n_neg"),
        F.sum("tie_contrib").alias("rank2_sum"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .withColumn("u2", F.col("rank2_sum") - F.col("n_pos") * (F.col("n_pos") + 1))
        .select(
            *gcols,
            "n_pos",
            "n_neg",
            "u2",
            _round6(F.col("u2"), 2 * F.col("n_pos") * F.col("n_neg")).alias("auc"),
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Reliability-diagram bins + the expected-calibration-error terms.

    Fixed-width bins over [0, 1]: ``bin = min(floor(score·n_bins),
    n_bins−1)``. Per bin: example count, positive count, the mean score
    in integer micro-units (scores snapped to 6 dp BEFORE summing, so
    the sum is an exact BIGINT — no float-accumulation order
    dependence), the observed positive rate, and ``|acc − conf|·n`` as
    the bin's ECE numerator (``ece = Σ gap_n / N`` downstream).

    Output: ``(group?, bin, n, n_pos, mean_score, pos_rate, gap)``.

    Scale shape: one hash aggregate on (group?, bin) — map-side partial
    combine collapses everything before the shuffle; output is at most
    ``n_bins`` rows per group."""
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    gcols = [group_col] if group_col else []
    s = F.col(score_col).cast("double")
    binned = df.select(
        *gcols,
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int").alias("bin"),
        F.col(label_col).cast("long").alias("__y"),
        # 6-dp micro-unit snap: integer summation is order-independent
        F.floor(s * 1_000_000 + F.lit(0.5)).cast("long").alias("__s_micro"),
    )
    agg = binned.groupBy(*gcols, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
        F.sum("__s_micro").alias("__s_sum"),
    )
    mean_score = _round6(F.col("__s_sum"), F.col("n") * 1_000_000)
    pos_rate = _round6(F.col("n_pos"), F.col("n"))
    return agg.select(
        *gcols,
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        F.round(F.abs(pos_rate - mean_score) * F.col("n"), 6).alias("gap"),
    )


def target_encode_oof(
    df: DataFrame,
    key_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    prior_weight: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Out-of-fold mean target encoding — the leakage-safe categorical
    feature (Micci-Barreca 2001 / the standard K-fold CatBoost-style
    guard): each row's encoding is the target mean of its category
    computed WITHOUT the row's own fold, so the feature never sees the
    label it will be judged against.

    Folds are the portable md5-bucket family
    (:func:`aces_spark.datapipe.sampling.sample_bucket_expr` mod
    ``n_folds``) over ``id_col`` — deterministic, engine-portable,
    shuffle-free. Per (key, fold) sums subtract from per-key totals, so
    the OOF mean is ``(tot_sum − fold_sum + prior_weight·global_mean)
    / (tot_cnt − fold_cnt + prior_weight)`` with the target snapped to
    6-dp micro-units first — all-integer numerators, one final rounded
    division. Rows whose category only occurs in their own fold fall
    back to the global mean (the smoothed form does this continuously
    when ``prior_weight > 0``).

    Output: one row per input row — ``(id_col, key_col, fold,
    encoded)``.

    Scale shape: two partial-combined aggregates (by (key, fold), then
    key) and one broadcast-sized join back onto the (key, fold) grid —
    the per-row join is on the key column, partitioned and skew-bounded
    by category cardinality. No per-row window, no shuffle of the
    target column beyond the grouped sums."""
    if n_folds < 2:
        raise ValueError("target_encode_oof: n_folds must be >= 2")
    t_micro = F.floor(F.col(target_col).cast("double") * 1_000_000 + F.lit(0.5)).cast(
        "long"
    )
    rows = df.select(
        id_col,
        key_col,
        (sample_bucket_expr(F.col(id_col), seed) % n_folds).cast("int").alias("fold"),
        t_micro.alias("__t"),
    )
    by_kf = rows.groupBy(key_col, "fold").agg(
        F.count(F.lit(1)).alias("f_cnt"), F.sum("__t").alias("f_sum")
    )
    by_k = by_kf.groupBy(key_col).agg(
        F.sum("f_cnt").alias("t_cnt"), F.sum("f_sum").alias("t_sum")
    )
    glob = by_k.agg(
        F.sum("t_cnt").alias("g_cnt"), F.sum("t_sum").alias("g_sum")
    )
    grid = (
        by_kf.join(by_k, key_col)
        .crossJoin(F.broadcast(glob))
        .withColumn("oof_cnt", F.col("t_cnt") - F.col("f_cnt"))
        .withColumn("oof_sum", F.col("t_sum") - F.col("f_sum"))
    )
    # global mean in micro-units, itself exactly rounded to an integer
    g_mean_micro = F.floor(
        F.col("g_sum").cast("double") / F.col("g_cnt").cast("double") + F.lit(0.5)
    ).cast("long")
    num = F.col("oof_sum") + F.lit(prior_weight) * g_mean_micro
    den = (F.col("oof_cnt") + F.lit(prior_weight)) * 1_000_000
    encoded = F.when(den > 0, _round6(num, den)).otherwise(
        _round6(g_mean_micro, F.lit(1_000_000))
    )
    enc = grid.select(key_col, "fold", encoded.alias("encoded"))
    return rows.select(id_col, key_col, "fold").join(enc, [key_col, "fold"])


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kaplan-Meier survival table — the nonparametric time-to-event
    profile (Kaplan & Meier 1958) behind retention curves, churn
    analysis, and time-to-readmission audits. ``event_col`` is 1 for an
    observed event, 0 for right-censoring at ``duration_col``.

    Per distinct event time (censor-only times are folded into the
    at-risk bookkeeping but emit no step): ``n_at_risk`` (subjects with
    duration ≥ t), ``n_events``, ``n_censored`` at t, and the step
    factor ``(n_at_risk − n_events) / n_at_risk`` rounded to 6 dp. The
    emitted counts are EXACT integers — the estimator's product form
    ``S(t) = Π factors`` is left to the consumer (a driver-side fold
    over ≤ distinct-times rows, or an exp-sum-log at reduced precision)
    because a cross-engine-exact cumulative float product is not a
    contract this table needs to carry.

    Scale shape: one groupBy on (group?, duration) then one per-group
    window over distinct times — cardinality of the time grid, not of
    subjects."""
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]
    by_t = df.groupBy(*gcols, F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    w = (
        Window.partitionBy(*gpart)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*gpart)
    at_risk = by_t.withColumn(
        "n_at_risk",
        F.sum("__n").over(wtot) - F.coalesce(F.sum("__n").over(w), F.lit(0)),
    )
    return at_risk.filter(F.col("n_events") > 0).select(
        *gcols,
        "t",
        "n_at_risk",
        "n_events",
        (F.col("__n") - F.col("n_events")).alias("n_censored"),
        _round6(F.col("n_at_risk") - F.col("n_events"), F.col("n_at_risk")).alias(
            "factor"
        ),
    )


def isotonic_fit(
    bins: DataFrame,
    x_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
    group_col: str | None = None,
    max_bins: int = 10_000,
) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration over an ordered
    bin table — pool-adjacent-violators via the minimax identity
    (Barlow et al. 1972): the weighted isotonic fit at bin ``k`` is

        y_iso(k) = max_{i<=k} min_{j>=k} mean(pos) over bins [i..j]

    which is PAV's exact solution but set-based: prefix sums give every
    interval mean ``(P_j − P_{i−1}) / (N_j − N_{i−1})`` from integers,
    a suffix-min window over ``j`` per start ``i`` collapses the inner
    min, and a prefix-max window over ``i`` per ``k`` the outer max.
    Interval means are exact-integer ratios divided once in IEEE double
    (correctly rounded, so both engines order candidate means
    identically) and the winning mean is snapped to 6 dp.

    The operand is a BIN table (the output of
    :func:`calibration_bins`, a quantile grid, a score histogram) —
    B² interval rows per group, so ``max_bins`` guards against calling
    this on raw examples; fitting on bins is also the statistically
    sane form at 100 TB (the raw-example fit interpolates the same
    step function).

    Output: ``(group?, x_col, n, n_pos, y_iso)`` — y_iso nondecreasing
    in ``x_col`` within each group."""
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]

    w_ord = Window.partitionBy(*gpart).orderBy(F.col("__x").asc())
    base = (
        bins.select(
            *gcols,
            F.col(x_col).alias("__x"),
            F.col(n_col).cast("long").alias("__n"),
            F.col(pos_col).cast("long").alias("__p"),
        )
        .withColumn("__idx", F.row_number().over(w_ord))
        .withColumn("__cn", F.sum("__n").over(w_ord))
        .withColumn("__cp", F.sum("__p").over(w_ord))
    )
    n_max = base.groupBy().agg(F.max("__idx").alias("m")).collect()[0]["m"]
    if n_max is not None and n_max > max_bins:
        raise ValueError(
            f"isotonic_fit: {n_max} bins exceeds max_bins={max_bins}; "
            "bin the scores first (calibration_bins / a quantile grid)"
        )
    starts = base.select(
        *gcols,
        F.col("__idx").alias("i"),
        (F.col("__cn") - F.col("__n")).alias("cn_before"),
        (F.col("__cp") - F.col("__p")).alias("cp_before"),
    )
    ends = base.select(
        *gcols,
        F.col("__idx").alias("j"),
        F.col("__cn").alias("cn_j"),
        F.col("__cp").alias("cp_j"),
    )
    pairs = starts.join(ends, gcols, "inner") if gcols else starts.crossJoin(ends)
    pairs = pairs.filter(F.col("i") <= F.col("j")).withColumn(
        "avg_ij",
        (F.col("cp_j") - F.col("cp_before")).cast("double")
        / (F.col("cn_j") - F.col("cn_before")).cast("double"),
    )
    # inner min over j >= k, realized as a suffix-min running window per
    # start i: m(i, k) = min_{j >= k} avg(i, j)
    w_sfx = (
        Window.partitionBy(*gpart, "i")
        .orderBy(F.col("j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inner = pairs.withColumn("m_ik", F.min("avg_ij").over(w_sfx)).select(
        *gcols, "i", F.col("j").alias("k"), "m_ik"
    ).filter(F.col("i") <= F.col("k"))
    # outer max over i <= k, realized as a prefix-max per k
    w_pfx = (
        Window.partitionBy(*gpart, "k")
        .orderBy(F.col("i").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fit = (
        inner.withColumn("y_raw", F.max("m_ik").over(w_pfx))
        .filter(F.col("i") == F.col("k"))
        .select(*gcols, F.col("k").alias("__idx"), F.round("y_raw", 6).alias("y_iso"))
    )
    return base.join(fit, [*gcols, "__idx"]).select(
        *gcols,
        F.col("__x").alias(x_col),
        F.col("__n").alias(n_col),
        F.col("__p").alias(pos_col),
        "y_iso",
    )


def rank_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Spearman rank correlation per group, exact under ties: Pearson
    on average ranks, with ranks carried as the INTEGER ``2·avg_rank =
    2·rank() + ties − 1`` so every sum (ΣR, ΣR², ΣRxRy) is exact
    BIGINT arithmetic; the only float ops are the final two
    correctly-rounded sqrts and one division, snapped to 6 dp. This is
    how two quality scorers get compared at corpus scale — monotone
    agreement, insensitive to either scorer's calibration.

    Output: ``(group?, n, rho)``; groups where either column is
    constant (zero rank variance) are dropped.

    Scale shape: two rank windows + two tie-count windows per group,
    then one partial-combined aggregate — no joins, no broadcast."""
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]

    def r2(col: str) -> Column:
        w_rank = Window.partitionBy(*gpart).orderBy(F.col(col).asc())
        w_ties = Window.partitionBy(*gpart, col)
        return (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1
        ).cast("long")

    ranked = df.select(*gcols, x_col, y_col).withColumn(
        "__rx", r2(x_col)
    ).withColumn("__ry", r2(y_col))
    # overflow audit: 2·avg_rank ≤ 2n, so Σr² ≈ 4n³ blows through BIGINT
    # past n ≈ 1.3M rows per group — the squared/cross products go
    # through DECIMAL(38,0) (exact to n ≈ 1.3e9 per group; the plain
    # rank sums Σr ≈ 2n² stay BIGINT-safe to n ≈ 2e9)
    dx = F.col("__rx").cast("decimal(19,0)")
    dy = F.col("__ry").cast("decimal(19,0)")
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__rx").alias("sx"),
        F.sum("__ry").alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    nd = agg["n"].cast("decimal(19,0)")
    sxd = F.col("sx").cast("decimal(19,0)")
    syd = F.col("sy").cast("decimal(19,0)")
    var_x = (nd * F.col("sxx") - sxd * sxd).cast("double")
    var_y = (nd * F.col("syy") - syd * syd).cast("double")
    cov = (nd * F.col("sxy") - sxd * syd).cast("double")
    return agg.filter((var_x > 0) & (var_y > 0)).select(
        *gcols,
        "n",
        F.round(cov / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("rho"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Exact Gini concentration index per group — the standard
    inequality audit for token budgets, per-domain corpus mass, and
    revenue concentration. Values are snapped to 6-dp micro-units
    (nonnegative required), ranked ascending (ties in any order — the
    rank-weighted sum is invariant within tie blocks), and

        G = (2·Σ i·v_i − (n+1)·Σ v) / (n·Σ v)

    stays in BIGINT until the single final division. Groups with zero
    total mass are dropped (G undefined).

    Output: ``(group?, n, total_micro, gini)``.

    Scale shape: one rank window per group + one partial-combined
    aggregate; the window sort is the honest price of an exact rank
    statistic (same envelope as the quantile family)."""
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]
    v = F.floor(F.col(value_col).cast("double") * 1_000_000 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(*gpart).orderBy(F.col("__v").asc())
    ranked = df.select(*gcols, v.alias("__v")).withColumn(
        "__i", F.row_number().over(w)
    )
    # overflow audit: Σ i·v ≈ n²·mean_v/2 exceeds BIGINT past ~4M rows
    # of 1e8-micro values — the rank-weighted sum and the closed form
    # run in DECIMAL(38,0) (exact until n²·mean_v ≈ 1e38)
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__v").alias("total_micro"),
        F.sum(
            F.col("__i").cast("decimal(19,0)") * F.col("__v").cast("decimal(19,0)")
        ).alias("ivsum"),
    )
    nd = agg["n"].cast("decimal(19,0)")
    td = F.col("total_micro").cast("decimal(19,0)")
    num = (2 * F.col("ivsum") - (nd + 1) * td).cast("double")
    den = (nd * td).cast("double")
    return agg.filter(F.col("total_micro") > 0).select(
        *gcols,
        "n",
        "total_micro",
        F.round(num / den, 6).alias("gini"),
    )


#: 6-dp micro-unit DCG discounts 1/log2(pos+1) for positions 1..20 —
#: precomputed literals so Spark and any oracle engine use the
#: IDENTICAL integers (no cross-libm log2 at query time).
NDCG_DISCOUNT_MICRO = [
    1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465,
    301030, 289065, 278943, 270238, 262650, 255958, 250000, 244651,
    239812, 235409, 231378, 227670,
]


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k per query — the graded ranking metric for search/rerank
    eval. The retrieved ranking orders by ``score_col`` desc (ties
    broken by ``id_col`` asc, deterministic in any engine); the ideal
    ranking orders by ``rel_col`` desc (same tiebreak). DCG uses the
    PRECOMPUTED integer discount table :data:`NDCG_DISCOUNT_MICRO`
    (positions 1..20), so both DCG and IDCG are exact BIGINT dot
    products ``Σ rel·disc_micro`` and NDCG is one correctly-rounded
    division snapped to 6 dp. Queries with zero ideal gain are
    dropped.

    Output: ``(query_col, dcg_micro, idcg_micro, ndcg)``.

    Scale shape: two top-k rank windows per query + one
    partial-combined aggregate — the per-query sorts partition on the
    query key; no joins."""
    if not 1 <= k <= len(NDCG_DISCOUNT_MICRO):
        raise ValueError(f"ndcg_at_k: k must be in [1, {len(NDCG_DISCOUNT_MICRO)}]")
    disc = F.array(*[F.lit(d) for d in NDCG_DISCOUNT_MICRO[:k]])

    def gain(order_col: str) -> Column:
        w = Window.partitionBy(query_col).orderBy(
            F.col(order_col).desc(), F.col(id_col).asc()
        )
        pos = F.row_number().over(w)
        return F.when(
            pos <= k, F.col(rel_col).cast("long") * F.element_at(disc, pos)
        ).otherwise(F.lit(0))

    scored = df.select(query_col, score_col, rel_col, id_col).withColumn(
        "__dg", gain(score_col)
    ).withColumn("__ig", gain(rel_col))
    agg = scored.groupBy(query_col).agg(
        F.sum("__dg").alias("dcg_micro"), F.sum("__ig").alias("idcg_micro")
    )
    return agg.filter(F.col("idcg_micro") > 0).select(
        query_col,
        "dcg_micro",
        "idcg_micro",
        _round6(F.col("dcg_micro"), F.col("idcg_micro")).alias("ndcg"),
    )


#: Poisson(1) pmf thresholds on the md5 bucket grid [0, 10000): a
#: bucket below POISSON1_THRESHOLDS[c] (and >= the previous) replicates
#: the row c times in that bootstrap rep. floor(cdf(c)*10000 + 0.5):
#: cdf = .367879, .735759, .919699, .981012, .996340, 1.
POISSON1_THRESHOLDS = [3679, 7358, 9197, 9810, 9963, 10000]


def poisson_bootstrap_means(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_reps: int = 40,
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Poisson bootstrap of the per-group mean (Chamandy et al. 2012 —
    the resampling scheme that actually works on sharded data): the
    classic n-with-replacement bootstrap needs global coordination per
    resample, but for large n the multinomial replication count of each
    row converges to independent Poisson(1), so each row can decide its
    own per-rep weight from a hash — embarrassingly parallel, one pass,
    exactly the estimator used for CI bands over planet-scale metrics.

    Weights are the portable md5 bucket of ``seed | "rep#id"``
    thresholded by the exact Poisson(1) cdf grid
    (:data:`POISSON1_THRESHOLDS`, capped at 5 — P(X>5) ≈ 1/2800);
    values snap to 6-dp micro-units so every rep's weighted sum is an
    exact BIGINT. Output: one row per (group?, rep) —
    ``(group?, rep, n_eff, mean)`` — the bootstrap DISTRIBUTION table;
    consumers take exact order statistics of ``mean`` across reps for
    any CI level (percentile-of-40-rows is driver-trivial). Reps whose
    resample is empty (possible in tiny groups) are dropped.

    Scale shape: rows × n_reps intermediate (posexplode of a literal
    rep array), collapsed by ONE partial-combined hash aggregate on
    (group?, rep) — the blow-up never crosses a shuffle unreduced. At
    100 TB pick n_reps to budget the map-side multiply; 40 reps bounds
    a 95% CI with the standard 1/√B ≈ 16% quantile jitter."""
    if n_reps < 2:
        raise ValueError("poisson_bootstrap_means: n_reps must be >= 2")
    gcols = [group_col] if group_col else []
    v_micro = F.floor(F.col(value_col).cast("double") * 1_000_000 + F.lit(0.5)).cast(
        "long"
    )
    reps = df.select(
        *gcols,
        v_micro.alias("__v"),
        F.col(id_col).cast("string").alias("__id"),
    ).select(
        *gcols,
        "__v",
        F.posexplode(F.array(*[F.lit(r) for r in range(n_reps)])).alias("rep", "__r"),
        "__id",
    )
    bucket = sample_bucket_expr(
        F.concat(F.col("rep").cast("string"), F.lit("#"), F.col("__id")),
        seed,
    )
    t = POISSON1_THRESHOLDS
    weight = (
        F.when(bucket < t[0], 0)
        .when(bucket < t[1], 1)
        .when(bucket < t[2], 2)
        .when(bucket < t[3], 3)
        .when(bucket < t[4], 4)
        .otherwise(5)
    ).cast("long")
    agg = (
        reps.withColumn("__w", weight)
        .groupBy(*gcols, "rep")
        .agg(
            F.sum("__w").alias("n_eff"),
            F.sum(F.col("__w") * F.col("__v")).alias("__wsum"),
        )
    )
    return agg.filter(F.col("n_eff") > 0).select(
        *gcols,
        "rep",
        "n_eff",
        _round6(F.col("__wsum"), F.col("n_eff") * 1_000_000).alias("mean"),
    )
