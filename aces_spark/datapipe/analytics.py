"""Event-stream analytics operators: sequential funnels, cohort
retention, and distribution quantiles.

The product-analytics companions to sessionization (``sessions.py``):
classic operations every event warehouse runs, expressed Spark-first.

Scale notes: the funnel groups once by the entity key and scans each
entity's sorted event array with a JVM higher-order function — one
exchange, no joins, no UDFs; retention is two hash aggregates with
uniform keys; quantiles use Spark's exact ``percentile`` aggregate
(map-side partial, same linear-interpolation definition as ANSI
``percentile_cont``/DuckDB ``quantile_cont``, so oracles compare exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timecol import as_timestamp


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential funnel: for each user, the earliest chain of timestamps
    completing ``steps`` IN ORDER (step *i+1* must occur strictly after
    the chosen step-*i* event; the chain is greedy-earliest, the standard
    funnel definition). Output: ``(user_id, step1_ts .. stepN_ts,
    n_steps)`` with nulls from the first uncompleted step.

    One ``user_col`` exchange; per user the sorted event array is folded
    with ``aggregate()`` (JVM-side, whole-stage codegen) — no joins, no
    Python. Greedy-earliest is optimal for sequential funnels: taking the
    earliest valid event for step *i* never prevents a later step that any
    other choice would allow.
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    k = len(steps)
    ev = events.select(
        F.col(user_col),
        F.col(type_col).alias("__t"),
        as_timestamp(ts_col).alias("__ts"),
    ).filter(F.col("__t").isin(list(steps)))

    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("__ts", "__t"))).alias("__evs")
    )

    # fold the sorted event list into an array of k chain timestamps:
    # slot i fills when its step name matches, slot i-1 is filled, and the
    # event is strictly later than slot i-1 (same-timestamp events cannot
    # satisfy consecutive steps — the strict-order funnel convention)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    acc0 = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step_fold(acc, e):
        slots = []
        for i in range(k):
            fillable = F.lit(i == 0) if i == 0 else acc[i - 1].isNotNull() & (
                e["__ts"] > acc[i - 1]
            )
            take = (
                acc[i].isNull()
                & (e["__t"] == F.element_at(steps_arr, i + 1))
                & fillable
            )
            slots.append(F.when(take, e["__ts"]).otherwise(acc[i]))
        return F.array(*slots)

    chain = F.aggregate(F.col("__evs"), acc0, step_fold)
    out_cols = [F.col(user_col)]
    for i, name in enumerate(steps):
        out_cols.append(chain[i].alias(f"step{i + 1}_{name}_ts"))
    n_steps = F.size(F.filter(chain, lambda t: t.isNotNull()))
    # nulls only appear as a suffix (slot i requires slot i-1), so the
    # non-null count IS the completed prefix length
    out_cols.append(n_steps.cast("long").alias("n_steps"))
    return per_user.select(*out_cols)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first-seen
    day; for each (cohort_day, periods-since-signup) bucket, the count of
    distinct users active in that period. Output:
    ``(cohort_day, period, n_active)`` with ``period`` in ``bucket_days``
    units (0 = the signup period).

    Two uniform hash aggregates (user → first day; (user, day) distinct →
    matrix rollup); the user-keyed exchange is the same partitioning the
    rest of the engine uses.
    """
    days = events.select(
        F.col(user_col), F.to_date(as_timestamp(ts_col)).alias("__day")
    ).distinct()
    first = days.groupBy(user_col).agg(F.min("__day").alias("cohort_day"))
    joined = days.join(first, user_col)
    period = (F.datediff(F.col("__day"), F.col("cohort_day")) / bucket_days).cast("long")
    return (
        joined.select(F.col("cohort_day"), period.alias("period"), F.col(user_col))
        .groupBy("cohort_day", "period")
        .agg(F.countDistinct(user_col).cast("long").alias("n_active"))
    )


def event_type_pivot(
    events: DataFrame,
    types: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Wide per-entity activity matrix: one row per user, one count column
    per event type (the feature-matrix shape downstream ML joins expect).

    ``types`` is explicit — passing the value list lets Spark skip the
    two-job distinct-collect a bare ``pivot(col)`` needs, and pins the
    output schema (stable columns even when a type is absent in a shard).
    One hash aggregate; pivot columns are map-side partials like any agg.
    """
    out = (
        events.groupBy(user_col)
        .pivot(type_col, types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        F.col(user_col),
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


def key_skew_stats(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """One-row partitioning-health report for a prospective shuffle key:
    key cardinality, row count, the heaviest key's share, mean/median/p99
    rows per key, and the max/mean skew ratio — the numbers to look at
    BEFORE choosing ``key_col`` as a join/groupBy key at scale (a skew
    ratio in the hundreds means salting or AQE skew-join handling).

    Output: ``(n_keys, n_rows, max_rows, mean_rows, p50_rows, p99_rows,
    skew_ratio)`` — ratios in exact basis points.

    Plan: one hash aggregate to per-key counts (uniform by definition of
    counting), then a single-row rollup of the counts relation.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    mean = F.sum("__n").cast("double") / F.count(F.lit(1)).cast("double")
    ratio = F.max("__n").cast("double") / mean
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.max("__n").cast("long").alias("max_rows"),
        (F.floor(mean * 10000 + 0.5).cast("double") / 10000.0).alias("mean_rows"),
        (
            F.floor(F.expr("percentile(__n, 0.5)") * 10000 + 0.5).cast("double")
            / 10000.0
        ).alias("p50_rows"),
        (
            F.floor(F.expr("percentile(__n, 0.99)") * 10000 + 0.5).cast("double")
            / 10000.0
        ).alias("p99_rows"),
        (F.floor(ratio * 10000 + 0.5).cast("double") / 10000.0).alias("skew_ratio"),
    )


def heavy_keys(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """The ``top_k`` heaviest values of ``key_col`` with their row share
    (exact basis points) — the candidates for salting / broadcast
    special-casing. Output: ``(key_col, n_rows, row_frac)``, ordered
    count desc then key asc (deterministic; plans as a distributed
    top-k, not a full sort).

    One scan: the total is a 1-row aggregate OF the per-key counts,
    broadcast back onto them — no second pass over the input (the old
    eager ``df.count()``) and no global window that would funnel a
    billion-key counts relation through one partition. The counts
    relation feeds BOTH the total aggregate and the join, so it is
    lineage-truncated once — without it Catalyst replays the input scan
    + partial aggregate per branch and the "one scan" claim is false.
    """
    counts = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("__total"))
    frac = F.col("n_rows").cast("double") / F.col("__total")
    return (
        counts.join(F.broadcast(total))
        .select(
            F.col(key_col),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.floor(frac * 10000 + 0.5).cast("double") / 10000.0).alias("row_frac"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key_col).asc())
        .limit(top_k)
    )


def length_quantiles(
    df: DataFrame,
    value_col: str = "n_chars",
    by: str | None = "source",
    probs: list[float] | None = None,
) -> DataFrame:
    """Exact distribution quantiles of ``value_col`` per group (or
    globally with ``by=None``), linear interpolation — the corpus-report
    operator ("what does the p99 doc length look like per source").
    Output: ``(by?, q_<p> ...)`` rounded to 4 dp.

    Spark's ``percentile`` is an exact aggregate with map-side partials;
    for 100 TB reports where exactness isn't required, swap in
    ``percentile_approx`` (t-digest, bounded memory) — same call shape.
    """
    if probs is None:
        probs = [0.25, 0.5, 0.9, 0.99]
    prob_arr = ", ".join(repr(float(p)) for p in probs)
    q = F.expr(f"percentile(`{value_col}`, array({prob_arr}))")
    aggs = [
        F.round(q[i], 4).alias(f"q_{str(p).replace('.', '_')}") for i, p in enumerate(probs)
    ]
    if by is None:
        return df.agg(*aggs)
    return df.groupBy(by).agg(*aggs)


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over each key's event stream:
    for every consecutive pair in (``ts_col``, ``order_col``) order, count
    ``from_type -> to_type`` and the within-``from_type`` probability.
    The behavioral-model / next-event-prediction primitive (and a drift
    check: compare matrices across corpus drops).

    Output ``(from_type, to_type, n_transitions, prob)`` with ``prob``
    in exact basis points of the from-type row total.

    Scale shape: ONE key-keyed exchange for the ``lead`` window, then a
    (|types|^2)-row aggregate with map-side partials; the probability
    normalization runs over that tiny aggregate, not the input.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    pairs = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    frac = F.col("n_transitions").cast("double") / row_total.cast("double")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.floor(frac * 10000 + 0.5).cast("double") / 10000.0).alias("prob"),
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    smoothing: float = 1.0,
) -> DataFrame:
    """Categorical distribution drift between two corpus drops: per-value
    counts and add-``smoothing`` (Laplace) probabilities from both sides,
    plus the value's contribution to KL(new || old). Sum the ``kl_term``
    column for the scalar divergence; alert when it jumps.

    Output ``(value, n_old, n_new, p_old, p_new, kl_term)`` over the
    UNION of observed values; probabilities at 6 dp (floor rule),
    ``kl_term = p_new * ln(p_new / p_old)`` at 6 dp computed from the
    UNROUNDED probabilities. Smoothing keeps both sides nonzero so the
    divergence is finite when a value appears on only one side — the
    standard add-one recipe.

    Scale shape: each side reduces to |values| rows BEFORE the join (two
    partial-aggregated passes + one tiny full-outer join); totals ride a
    1-row window over the aggregate, never a second input scan.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (keeps KL finite)")
    o = old.groupBy(F.col(col).alias("__vo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_old")
    )
    n = new.groupBy(F.col(col).alias("__vn")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    # NULL-SAFE join key: a plain full-outer on `value` splits a null
    # category into two unmatched rows (null never equals null), double-
    # counting it in |values| and emitting two spurious KL terms
    j = o.join(n, F.col("__vo").eqNullSafe(F.col("__vn")), "full_outer").select(
        F.coalesce("__vo", "__vn").alias("value"),
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    w = Window.partitionBy()
    n_values = F.count(F.lit(1)).over(w).cast("double")
    tot_old = F.sum("n_old").over(w).cast("double")
    tot_new = F.sum("n_new").over(w).cast("double")
    s = F.lit(float(smoothing))
    p_old = (F.col("n_old").cast("double") + s) / (tot_old + s * n_values)
    p_new = (F.col("n_new").cast("double") + s) / (tot_new + s * n_values)
    kl = p_new * F.log(p_new / p_old)
    return j.select(
        "value",
        "n_old",
        "n_new",
        (F.floor(p_old * 1000000 + 0.5).cast("double") / 1000000.0).alias("p_old"),
        (F.floor(p_new * 1000000 + 0.5).cast("double") / 1000000.0).alias("p_new"),
        (F.floor(kl * 1000000 + 0.5).cast("double") / 1000000.0).alias("kl_term"),
    )


def anomaly_zscore(
    df: DataFrame,
    key_col: str,
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outlier flagging: each row's deviation from ITS
    key's mean in units of the key's population stddev — the monitoring
    primitive ("this user's metric is 5σ off its own baseline").

    Output: the input's ``(key, value)`` rows plus ``mean``, ``stddev``,
    ``zscore`` (4 dp, floor rule; 0 when the key's stddev is 0) and
    ``is_anomaly`` (``|z| > threshold``). Mean/stddev use the explicit
    E[x²]−E[x]² population formula over DECIMAL(28,12) sums — the same
    engine-exact recipe as ``embedding_dim_stats`` — so the flags are
    reproducible, not partial-sum-order-dependent.

    Scale shape: one key-keyed aggregate (map-side partials) joined back
    to the stream — the aggregate side is |keys| rows, broadcast when
    small; never a window over the raw stream (a per-key window would
    sort 100 TB for two scalars).
    """
    # DECIMAL(18,6): wide enough for event metrics, and the x·x product
    # type (37,12) stays inside both engines' 38-digit ceiling WITHOUT
    # scale truncation — a (28,12) square would overflow precision and
    # round differently per engine
    x = F.col(value_col).cast("decimal(18,6)")
    stats = df.groupBy(key_col).agg(
        F.count(F.col(value_col)).cast("long").alias("__n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    ex2 = F.col("__ss").cast("double") / F.col("__n").cast("double")
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))
    stats = stats.select(
        key_col,
        mean.alias("__mean"),
        F.sqrt(var).alias("__std"),
    )
    z_raw = (F.col(value_col).cast("double") - F.col("__mean")) / F.col("__std")
    z = F.when(F.col("__std") == 0.0, F.lit(0.0)).otherwise(
        F.floor(z_raw * 10000 + 0.5).cast("double") / 10000.0
    )
    return df.join(stats, key_col).select(
        *[F.col(c) for c in df.columns],
        (F.floor(F.col("__mean") * 10000 + 0.5).cast("double") / 10000.0).alias("mean"),
        (F.floor(F.col("__std") * 10000 + 0.5).cast("double") / 10000.0).alias("stddev"),
        z.alias("zscore"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def _capped_key_items(
    df: DataFrame, key_col: str, item_col: str, max_items_per_key: int
) -> DataFrame:
    """Distinct (key, item) pairs with each key's item set capped at its
    ``max_items_per_key`` most-frequent items (count-desc / item-asc
    deterministic rank) — the shared quadratic-blowup guard in front of
    every per-key pair self-join (:func:`covisitation`,
    :func:`association_rules`)."""
    ki = df.groupBy(key_col, item_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(key_col).orderBy(
        F.col("__cnt").desc(), F.col(item_col).asc()
    )
    return (
        ki.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_items_per_key)
        .select(key_col, item_col)
    )


def covisitation(
    df: DataFrame,
    key_col: str = "user_id",
    item_col: str = "item",
    max_items_per_key: int = 50,
    min_pairs: int = 1,
) -> DataFrame:
    """Item co-visitation counts: for every pair of items interacted with
    by the same key, the number of keys sharing both — the
    candidate-generation backbone of large-scale recommenders (and of
    "documents cited together" analyses).

    Output ``(item_a, item_b, n_keys)`` with ``item_a < item_b``.

    Scale shape: per (key, item) dedup first (multiplicity within a key
    must not inflate the pair count), then the per-key item set is CAPPED
    at ``max_items_per_key`` (keep the key's most-frequent items,
    count-desc / item-asc deterministic rank) BEFORE the self-join — the
    cap turns the per-key quadratic blowup (a 10⁶-item crawler key would
    emit 10¹² pairs) into ≤ cap² bounded work, the standard production
    mitigation. The pair join is key-keyed (co-partitioned equi-join).
    The capped relation feeds BOTH sides of the self-join, so its
    lineage is truncated once (lazy localCheckpoint) — without it
    Catalyst replays the dedup + rank-window upstream per branch (same
    rule :func:`association_rules` follows).
    """
    capped = _capped_key_items(
        df, key_col, item_col, max_items_per_key
    ).localCheckpoint(eager=False)
    a = capped.select(F.col(key_col), F.col(item_col).alias("item_a"))
    b = capped.select(F.col(key_col), F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, key_col)
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
    return pairs.filter(F.col("n_keys") >= min_pairs)


def association_rules(
    df: DataFrame,
    key_col: str = "user_id",
    item_col: str = "item",
    max_items_per_key: int = 50,
    min_pairs: int = 1,
) -> DataFrame:
    """Pairwise association rules over (key, item) interactions: for
    every ORDERED item pair ``antecedent -> consequent`` co-engaged by
    ``min_pairs``-plus keys, the market-basket metrics — support,
    confidence, lift — computed exactly. The "users who touched A also
    touched B" primitive (recommendation candidates, co-purchase
    analysis, co-citation strength).

    All three ratios are round-half-up at basis-point precision using
    PURE INTEGER arithmetic — ``floor(N/D + 1/2) = (2N + D) div (2D)``
    on positive integers — so every engine produces bit-identical
    doubles (no float division anywhere before the final exact
    ``bp / 10000`` conversion).

    Output: ``(antecedent, consequent, n_both, n_antecedent,
    n_consequent, n_keys, support, confidence, lift)``.

    Scale shape: per-(key, item) dedup, then the per-key item set is
    capped at ``max_items_per_key`` (count-desc / item-asc
    deterministic) BEFORE the key-keyed pair self-join — same quadratic
    guard as :func:`covisitation`; per-item key counts come from the
    SAME capped relation (metrics stay mutually consistent), which is
    lazily checkpointed once and feeds all three branches; the total
    key count is a 1-row aggregate broadcast back (no second input
    scan, no driver hop) — the :func:`heavy_keys` idiom.
    """
    capped = _capped_key_items(
        df, key_col, item_col, max_items_per_key
    ).localCheckpoint(eager=False)
    # item_counts feeds TWO joins (antecedent and consequent sides):
    # truncate once so the per-item aggregate over the checkpointed
    # capped relation runs once per job, not per side
    item_counts = (
        capped.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__n_item"))
        .localCheckpoint(eager=False)
    )
    total = capped.select(key_col).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__n_keys")
    )
    a = capped.select(F.col(key_col), F.col(item_col).alias("antecedent"))
    b = capped.select(F.col(key_col), F.col(item_col).alias("consequent"))
    pairs = (
        a.join(b, key_col)
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    out = (
        pairs.join(
            item_counts.select(
                F.col(item_col).alias("antecedent"),
                F.col("__n_item").alias("n_antecedent"),
            ),
            "antecedent",
        )
        .join(
            item_counts.select(
                F.col(item_col).alias("consequent"),
                F.col("__n_item").alias("n_consequent"),
            ),
            "consequent",
        )
        .join(F.broadcast(total))
    )
    # round-half-up at basis points, all-integer: (2N + D) div (2D)
    sup_bp = F.expr("(2 * n_both * 10000 + __n_keys) div (2 * __n_keys)")
    conf_bp = F.expr("(2 * n_both * 10000 + n_antecedent) div (2 * n_antecedent)")
    lift_bp = F.expr(
        "(2 * n_both * __n_keys * 10000 + n_antecedent * n_consequent)"
        " div (2 * n_antecedent * n_consequent)"
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        F.col("n_antecedent").cast("long").alias("n_antecedent"),
        F.col("n_consequent").cast("long").alias("n_consequent"),
        F.col("__n_keys").alias("n_keys"),
        (sup_bp.cast("double") / 10000.0).alias("support"),
        (conf_bp.cast("double") / 10000.0).alias("confidence"),
        (lift_bp.cast("double") / 10000.0).alias("lift"),
    )


def winsorized_stats(
    df: DataFrame,
    keys,
    value_col: str = "value",
    lo_bp: int = 100,
    hi_bp: int = 9900,
) -> DataFrame:
    """Per-key winsorized mean: exact interpolated percentile bounds at
    ``lo_bp``/``hi_bp`` basis points, values clamped into them, then the
    mean of the clamped values — the outlier-robust statistic that keeps
    every observation (unlike trimming) while bounding the influence of
    the tails. Output ``(keys…, n_points, lo_bound, hi_bound, win_mean)``.

    INTEGER-exact percentile interpolation (engine-portable, unlike a
    float ``percentile_cont`` on irrational positions): values in
    micro-units, the target position on the sorted key in TEN-THOUSANDTHS
    ``pos_tt = (n-1)·bp``, so ``idx = pos_tt div 1e4``, ``frac = pos_tt
    mod 1e4``, and the interpolation ``lower + (next-lower)·frac div 1e4``
    involve only BIGINTs — the neighbor difference is non-negative by
    sort order, so truncating and flooring div agree; only the final
    clamped-sum / n mean needs the sign-decomposed div.

    Scale shape: ONE key exchange shared by the rank window, the
    full-frame bound windows, and the final aggregate (same partition
    keys throughout — Spark reuses the exchange); O(1) aggregate state
    per key, no joins, no second scan.
    """
    if isinstance(keys, str):
        keys = [keys]
    if not 0 <= lo_bp <= hi_bp <= 10000:
        raise ValueError("need 0 <= lo_bp <= hi_bp <= 10000")
    y = F.floor(F.col(value_col).cast("double") * 1000000 + F.lit(0.5)).cast("long")
    rows = df.select(*keys, y.alias("__y")).filter(F.col("__y").isNotNull())
    w_rank = Window.partitionBy(*keys).orderBy("__y")
    w_full = Window.partitionBy(*keys)
    rows = rows.select(
        *keys,
        "__y",
        (F.row_number().over(w_rank) - 1).alias("__rk"),  # 0-based sort rank
        F.count(F.lit(1)).over(w_full).alias("__n"),
    )

    def exact_div(num, den: int):
        # truncating integer division for NON-NEGATIVE operands as pure
        # Column arithmetic: subtract the mod so the quotient is
        # integral, then divide in DECIMAL(38,0) — exact at any int64
        # magnitude. The previous double division rounded dividends past
        # 2^53 (value spans ≳1e3 raw units in micro-units) and could be
        # off by one micro-unit vs the oracle's exact `//`.
        return ((num - num % den).cast("decimal(38,0)") / F.lit(den)).cast(
            "long"
        )

    def bound(bp: int):
        pos_tt = (F.col("__n") - 1) * bp
        idx = exact_div(pos_tt, 10000)
        frac = pos_tt % 10000
        nxt = F.least(idx + 1, F.col("__n") - 1)
        lower = F.max(F.when(F.col("__rk") == idx, F.col("__y"))).over(w_full)
        upper = F.max(F.when(F.col("__rk") == nxt, F.col("__y"))).over(w_full)
        return lower + exact_div((upper - lower) * frac, 10000)

    rows = rows.select(
        *keys, "__y", bound(lo_bp).alias("__lo_u"), bound(hi_bp).alias("__hi_u")
    )
    clamped = F.least(F.greatest(F.col("__y"), F.col("__lo_u")), F.col("__hi_u"))
    agg = (
        rows.select(*keys, "__lo_u", "__hi_u", clamped.alias("__c"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.max("__lo_u").alias("__lo"),
            F.max("__hi_u").alias("__hi"),
            F.sum("__c").alias("__sum"),
        )
    )
    mean_u = F.when(
        F.col("__sum") >= 0, F.expr("__sum div n_points")
    ).otherwise(-F.expr("(-__sum) div n_points"))
    return agg.select(
        *keys,
        "n_points",
        (F.col("__lo").cast("double") / 1000000.0).alias("lo_bound"),
        (F.col("__hi").cast("double") / 1000000.0).alias("hi_bound"),
        (mean_u.cast("double") / 1000000.0).alias("win_mean"),
    )


def ab_welch_ttest(
    df: DataFrame,
    variant_col: str = "variant",
    value_col: str = "value",
) -> DataFrame:
    """Welch's unequal-variance t-test between the two variants of an
    A/B experiment (r8) — the read-out step after experiment assignment,
    run over per-user metric rows. Exactly two distinct variants are
    expected; output is ONE row:

    ``(variant_a, variant_b, n_a, n_b, mean_a, mean_b, t_stat,
    welch_df)`` — variants in lexicographic order; means rounded to 6
    decimals, ``t_stat`` to 4, the Satterthwaite degrees of freedom to
    2. Variants with fewer than 2 observations are EXCLUDED from
    pairing (a single-observation variant has no sample variance —
    the n−1 denominator would be 0 and every statistic NULL), so a
    degenerate experiment yields zero rows rather than a row of NULL
    statistics (r8 advisor finding).

    Determinism discipline: metric values are fixed-pointed to
    micro-units (floor half-up — the engine-identical rounding), the
    three moments (n, Σu, Σu²) accumulate EXACTLY in DECIMAL(38,0) —
    order-free — and only the finished moments are cast to double for
    the closed-form t and ν, all single IEEE operations that every
    engine rounds identically. Sample variance uses the n−1 form:
    ``s² = (n·Σu² − (Σu)²) / (n·(n−1))`` in micro².

    Scale shape: one hash aggregate keyed by the 2-value variant column
    (map-side partials collapse everything), then a 2-row pivot on the
    driver-free plan — no collect, no join against the corpus.
    """
    dec = "decimal(38,0)"
    u = F.expr(f"cast(floor({value_col} * 1000000 + 0.5) as {dec})")
    moments = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(variant_col).cast("string").alias("__v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(u).cast(dec).alias("s1"),
            F.sum(u * u).cast(dec).alias("s2"),
        )
    )
    # the |variants|-row moment table feeds both pairwise-join sides:
    # truncate so the corpus aggregate never replays per branch
    moments = moments.localCheckpoint(eager=False)
    a = moments.alias("a")
    b = moments.alias("b")
    pair = a.join(
        b,
        # n >= 2 on both sides: a 1-observation variant has s² = 0/0
        (F.col("a.__v") < F.col("b.__v"))
        & (F.col("a.n") >= 2)
        & (F.col("b.n") >= 2),
    ).select(
        F.col("a.__v").alias("variant_a"),
        F.col("b.__v").alias("variant_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.s1").cast("double").alias("s1a"),
        F.col("b.s1").cast("double").alias("s1b"),
        # exact-integer variance numerators, cast once
        (
            F.col("a.n") * F.col("a.s2") - F.col("a.s1") * F.col("a.s1")
        ).cast("double").alias("va_num"),
        (
            F.col("b.n") * F.col("b.s2") - F.col("b.s1") * F.col("b.s1")
        ).cast("double").alias("vb_num"),
    )
    mean_a = F.col("s1a") / F.col("n_a") / 1e6
    mean_b = F.col("s1b") / F.col("n_b") / 1e6
    var_a = F.col("va_num") / F.col("n_a") / (F.col("n_a") - 1) / 1e12
    var_b = F.col("vb_num") / F.col("n_b") / (F.col("n_b") - 1) / 1e12
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    t = (mean_a - mean_b) / F.sqrt(se2_a + se2_b)
    nu = (se2_a + se2_b) * (se2_a + se2_b) / (
        se2_a * se2_a / (F.col("n_a") - 1) + se2_b * se2_b / (F.col("n_b") - 1)
    )
    return pair.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(nu, 2).alias("welch_df"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str | None = None,
    n_mads: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier detection (r10) — the
    quality-filtering screen that survives what the mean/stddev z-score
    (:func:`anomaly_zscore`) cannot: a contaminated tail drags the mean
    toward itself, masking the very outliers being hunted; the median
    and the median-absolute-deviation have a 50% breakdown point
    (Hampel 1974), so pricing-error sweeps and length-spike screens
    stay calibrated no matter how heavy the tail.

    Exactness: medians are LOWER medians — the value at rank
    ``⌊(n+1)/2⌋`` in value order (rank ties share the value, so the
    selection is order-independent) — and on DECIMAL inputs every
    comparison (``|x − med| > n_mads · mad``) is exact integer
    arithmetic: no percentile interpolation, nothing engine-dependent.

    Output: the flagged rows only —
    ``(group?, id_col, value_col, med, mad, abs_dev)`` where
    ``abs_dev > n_mads · mad``.

    Scale shape: two groupwise rank windows (value order, then
    abs-deviation order) — exact medians cost a per-group sort each,
    the honest price of exactness; at 100 TB with million-row groups
    swap the rank windows for ``approx_percentile`` and keep the same
    flag rule (the approximate path trades the exact-integer contract
    for two fewer sorts). The group key partitions everything — no
    cross-group traffic."""
    if n_mads < 1:
        raise ValueError("robust_outliers: n_mads must be >= 1")
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(*gpart).orderBy(F.col(col).asc())
        wn = Window.partitionBy(*gpart)
        ranked = frame.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(wn)
        )
        return ranked.filter(
            F.col("__rn") == F.floor((F.col("__n") + 1) / 2)
        ).select(*gcols, F.col(col).alias(out))

    med = lower_median(df.select(*gcols, value_col), value_col, "med")
    joined = (
        df.select(*gcols, id_col, value_col).join(F.broadcast(med), gcols)
        if gcols
        else df.select(id_col, value_col).crossJoin(F.broadcast(med))
    )
    devs = joined.withColumn("abs_dev", F.abs(F.col(value_col) - F.col("med")))
    mad = lower_median(devs.select(*gcols, "abs_dev"), "abs_dev", "mad")
    flagged = (
        devs.join(F.broadcast(mad), gcols)
        if gcols
        else devs.crossJoin(F.broadcast(mad))
    )
    return flagged.filter(F.col("abs_dev") > F.lit(n_mads) * F.col("mad")).select(
        *gcols, id_col, value_col, "med", "mad", "abs_dev"
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: int = 100,
) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975) — the
    standard heavy-tail diagnostic for document lengths, degree
    distributions, and engagement counts: α̂ below ~2 means infinite
    variance (mean-based capacity planning is wrong), and drifting α̂
    across snapshots flags distribution shift in the corpus tail.

        α̂ = k / Σ_{i=1..k} ln( x_(i) / x_(k+1) )

    over the k+1 largest values per group (x_(1) ≥ … ≥ x_(k+1) > 0).
    Engine portability: each log-ratio is snapped to integer micro-nats
    (``floor(ln(x_i/x_ref)·1e6 + 0.5)`` — the same snap-before-sum
    contract as the LM family) so the denominator is an exact BIGINT
    sum; α̂ is one correctly-rounded division, 6 dp.

    Output: ``(group?, k, x_ref_micro, lnsum_micronats, alpha)``;
    groups with fewer than ``k+1`` positive values, or a zero log-sum
    (top k+1 values all equal), are dropped.

    Scale shape: one per-group top-(k+1) rank window — the filter
    ``rn <= k+1`` collapses everything else at the exchange — then one
    tiny aggregate. k is a constant; the window never materializes more
    than k+1 rows per group past the sort."""
    if k < 2:
        raise ValueError("hill_tail_index: k must be >= 2")
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*gpart).orderBy(F.col("__v").desc())
    top = (
        df.select(*gcols, v.alias("__v"))
        .filter(F.col("__v") > 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k + 1)
    )
    wg = Window.partitionBy(*gpart)
    ref = top.withColumn(
        "__xref", F.min(F.when(F.col("__rn") == k + 1, F.col("__v"))).over(wg)
    ).filter(F.col("__xref").isNotNull())
    lr_micro = F.floor(
        F.log(F.col("__v") / F.col("__xref")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    agg = (
        ref.filter(F.col("__rn") <= k)
        .withColumn("__lr", lr_micro)
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max(
                F.floor(F.col("__xref") * 1_000_000 + F.lit(0.5)).cast("long")
            ).alias("x_ref_micro"),
            F.sum("__lr").alias("lnsum_micronats"),
        )
    )
    return agg.filter(F.col("lnsum_micronats") > 0).select(
        *gcols,
        "k",
        "x_ref_micro",
        "lnsum_micronats",
        F.round(
            F.col("k").cast("double") * 1_000_000
            / F.col("lnsum_micronats").cast("double"),
            6,
        ).alias("alpha"),
    )


def cusum_scan(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    target: float,
    group_col: str | None = None,
    slack: float = 0.0,
) -> DataFrame:
    """One-sided CUSUM drift statistic per row (Page 1954) — the
    classic sequential changepoint detector for metric streams: small
    persistent upward shifts accumulate while noise resets to zero.

    The textbook recurrence ``s_i = max(0, s_{i-1} + x_i − target −
    slack)`` looks inherently sequential, but the drawdown identity
    makes it RELATIONAL: with ``P_i = Σ_{j≤i} (x_j − target − slack)``,

        s_i = P_i − min(0, min_{j≤i} P_j)

    — two running windows over the order key, no recursion, no UDF.
    Values, target, and slack all snap to 6-dp micro-units so every
    prefix sum and running min is exact BIGINT; the emitted statistic
    stays in micro-units (``cusum_micro``).

    ``order_cols`` must be a deterministic total order within each
    group (e.g. ``["ts", "event_id"]``) — CUSUM is order-defined.

    Scale shape: one exchange on the group key, one sort, two framed
    window passes — identical envelope to the engine's rolling-stats
    kernels; the statistic column composes with any alarm rule
    downstream."""
    gcols = [group_col] if group_col else []
    gpart = gcols if gcols else [F.lit(1)]
    t_micro = round(float(target) * 1_000_000) + round(float(slack) * 1_000_000)
    v = F.floor(F.col(value_col).cast("double") * 1_000_000 + F.lit(0.5)).cast("long")
    order = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(*gpart)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scanned = df.select(*gcols, *order_cols, v.alias("__v")).withColumn(
        "__p", F.sum(F.col("__v") - F.lit(t_micro)).over(w)
    )
    return scanned.select(
        *gcols,
        *order_cols,
        F.col("__v").alias("value_micro"),
        (
            F.col("__p") - F.least(F.lit(0).cast("long"), F.min("__p").over(w))
        ).alias("cusum_micro"),
    )


def cusum_drift_report(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    target: float,
    threshold: float,
    group_col: str | None = None,
    slack: float = 0.0,
) -> DataFrame:
    """Per-group CUSUM drift summary over :func:`cusum_scan`: total
    rows, alarm count (``cusum > threshold``), the peak statistic, and
    the earliest order position achieving the peak (deterministic
    argmax: min of the first order column among peak rows). One row per
    group at every corpus size — the dashboard form; the per-row scan
    is the composable form."""
    h_micro = round(float(threshold) * 1_000_000)
    scan = cusum_scan(df, value_col, order_cols, target, group_col, slack)
    gcols = [group_col] if group_col else []
    first_order = order_cols[0]
    agg = scan.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cusum_micro") > h_micro).cast("long")).alias("n_alarms"),
        F.max("cusum_micro").alias("max_cusum_micro"),
    )
    peak_at = (
        scan.join(
            agg.select(*gcols, F.col("max_cusum_micro").alias("__mx")),
            gcols,
        )
        if gcols
        else scan.crossJoin(
            F.broadcast(agg.select(F.col("max_cusum_micro").alias("__mx")))
        )
    )
    peak = (
        peak_at.filter(F.col("cusum_micro") == F.col("__mx"))
        .groupBy(*gcols)
        .agg(F.min(first_order).alias("peak_at"))
    )
    out = agg.join(F.broadcast(peak), gcols) if gcols else agg.crossJoin(
        F.broadcast(peak)
    )
    return out.select(*gcols, "n", "n_alarms", "max_cusum_micro", "peak_at")
