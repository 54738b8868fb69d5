"""Single-pass data-quality validation: declarative rules → one
aggregate over the table → one row per rule with violation counts.

The pre-ingest gate a 100 TB pipeline runs before accepting a new drop:
every rule compiles to a ``sum(case when violated)`` column expression,
so ANY number of rules costs exactly ONE scan + one map-side-combined
aggregate — never a pass per rule, never a collect. Uniqueness rules are
the exception (they need a key-count aggregate) and are computed in the
same job as a second tiny aggregate over the group counts.

Rules (all row-local unless noted):

- ``("not_null", col)`` — col must be non-null
- ``("unique", col)`` — col must be globally unique (group aggregate)
- ``("in_range", col, lo, hi)`` — lo <= col <= hi (inclusive; null fails)
- ``("in_set", col, values)`` — col ∈ values (null fails)
- ``("matches", col, regex)`` — string col matches regex (null fails)
- ``("non_negative", col)`` — col >= 0 (null fails)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_rules"]


def _violation_expr(rule: tuple) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        ok = c.isNotNull()
    elif kind == "in_range":
        lo, hi = rule[2], rule[3]
        ok = c.isNotNull() & (c >= lo) & (c <= hi)
    elif kind == "in_set":
        ok = c.isNotNull() & c.isin(list(rule[2]))
    elif kind == "matches":
        ok = c.isNotNull() & c.rlike(rule[2])
    elif kind == "non_negative":
        ok = c.isNotNull() & (c >= 0)
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    return F.sum(F.when(ok, 0).otherwise(1)).cast("long")


def _rule_name(rule: tuple) -> str:
    return f"{rule[0]}({rule[1]})"


def check_rules(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate every rule in one pass. Output: ``(rule, n_rows,
    n_violations, violation_frac)`` per rule — ``violation_frac`` in
    exact basis points; a clean table is ``n_violations = 0`` on every
    row.

    Plan: all row-local rules share ONE aggregate (each is a conditional
    sum — map-side partials, no shuffle beyond the single-row reduce);
    each ``unique`` rule adds one key-count aggregate whose input is the
    same scan. Results union into the small report frame.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    row_rules = [r for r in rules if r[0] != "unique"]
    uniq_rules = [r for r in rules if r[0] == "unique"]

    reports = []
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for r in row_rules:
            aggs.append(_violation_expr(r).alias(_rule_name(r)))
        wide = df.agg(*aggs)
        stack_pairs = ", ".join(
            f"'{_rule_name(r)}', `{_rule_name(r)}`" for r in row_rules
        )
        reports.append(
            wide.selectExpr(
                "__n",
                f"stack({len(row_rules)}, {stack_pairs}) AS (rule, n_violations)",
            ).select("rule", F.col("__n").alias("n_rows"), "n_violations")
        )
    for r in uniq_rules:
        col = r[1]
        dup = (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum("__c").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
                .cast("long")
                .alias("n_violations"),
            )
            .select(F.lit(_rule_name(r)).alias("rule"), "n_rows", "n_violations")
        )
        reports.append(dup)

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    frac = F.col("n_violations").cast("double") / F.col("n_rows").cast("double")
    return out.select(
        "rule",
        "n_rows",
        "n_violations",
        (F.floor(frac * 10000 + 0.5).cast("double") / 10000.0).alias("violation_frac"),
    )
