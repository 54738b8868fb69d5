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

from pyspark.sql import DataFrame
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
