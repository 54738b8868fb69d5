"""Plan audit: build every ``queries()`` entry's PHYSICAL plan and sweep
it for the scale anti-patterns this repo bans, printing one JSON line.

Checks per query (plan-only — nothing executes except plan build):

- ``python_udf``: any row-at-a-time Python eval (``BatchEvalPython``) —
  the 10-100× slow path; Arrow ``ArrowEvalPython``/``mapInPandas`` stages
  are reported separately as ``arrow_stages`` (sanctioned, e.g. the
  multimodal decode plumbing).
- ``nonbroadcast_cartesian``: a ``CartesianProduct`` operator — an
  all-pairs product that did not become a broadcast nested loop; always
  a bug at scale.
- ``bnlj``: ``BroadcastNestedLoopJoin`` — acceptable ONLY for
  1-row/threshold-sized sides (the quantile-bounds pattern); listed so a
  human can eyeball the query names.
- ``n_exchanges``: count of shuffle exchanges — not an error, but the
  number that should stay flat as operators evolve.
- ``untruncated_reuse``: the SAME normalized Window / final-Aggregate
  signature appearing ≥2 times in one plan — the fingerprint of a
  DataFrame feeding ≥2 join branches WITHOUT ``localCheckpoint``
  lineage truncation, which makes Catalyst replay the whole upstream
  per branch (exchange reuse does not save it: branch-specific aliases
  make the subtrees non-identical — the r6 ``item_covisitation``
  finding). Truncated reuse shows as one ``Scan ExistingRDD`` feeding
  both branches and trips nothing. Expr-ids are stripped before
  comparison; ``partial_`` aggregates are kept distinct from finals so
  an ordinary partial+final pair does not false-positive.

Exit code 1 if any query trips ``python_udf`` or
``nonbroadcast_cartesian`` (the two hard bans); ``untruncated_reuse``
is a loud warning (listed in the summary), not an exit-code failure.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


_EXPR_ID = re.compile(r"#\d+L?")


_CODEGEN = re.compile(r"\*\(\d+\) ")
_ROOTS = ("Window ", "WindowGroupLimit ", "HashAggregate", "SortAggregate",
          "ObjectHashAggregate")


def duplicated_signatures(plan: str) -> list[str]:
    """Duplicated normalized SUBTREES rooted at a Window / Aggregate
    operator — see ``untruncated_reuse`` in the module doc.

    Whole-subtree comparison (everything printed below the operator,
    expr-ids and codegen-stage markers stripped) rather than line
    comparison: the same window SPEC legitimately runs on two different
    inputs (SCD2 dedups current + updates with one spec; incremental
    merge aggregates state + batch identically), and only an identical
    UPSTREAM means Catalyst is replaying work. Branch-specific aliases
    introduced ABOVE the shared relation (the covisitation item_a /
    item_b projections) don't perturb the shared subtree, so the r6
    finding class is still caught. A lineage-truncated reuse scans
    ``ExistingRDD`` twice and has no Window/Aggregate below it — it
    trips nothing."""
    lines = plan.splitlines()
    depths = [len(ln) - len(ln.lstrip(" :+-")) for ln in lines]

    def norm(ln: str) -> str:
        return _EXPR_ID.sub("", _CODEGEN.sub("", ln.lstrip(" :+-"))).strip()

    sigs: list[tuple[str, str]] = []  # (subtree_key, display_root)
    cache_stack: list[int] = []  # depths of enclosing InMemory* nodes
    for i, ln in enumerate(lines):
        head = _CODEGEN.sub("", ln.lstrip(" :+-"))
        while cache_stack and depths[i] <= cache_stack[-1]:
            cache_stack.pop()
        if head.startswith(("InMemoryTableScan", "InMemoryRelation")):
            cache_stack.append(depths[i])
            continue
        if cache_stack:
            # inside a persisted relation's printed plan: the work runs
            # once however many scans reference it — textual repetition
            # here is cache reuse, not replay
            continue
        if not head.startswith(_ROOTS):
            continue
        sub = [norm(ln)]
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and depths[j] <= depths[i]:
                break
            sub.append(norm(lines[j]))
        sigs.append(("\n".join(sub), norm(ln)[:160]))
    dup = [k for k, c in Counter(k for k, _ in sigs).items() if c > 1]
    seen: dict[str, str] = {}
    for k, root in sigs:
        if k in dup:
            seen.setdefault(k, root)
    return list(seen.values())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hard_fail = []
    report = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            # each query's plan must be audited self-contained: persisted
            # relations registered while building a PREVIOUS query's plan
            # otherwise substitute into this one as InMemoryRelations and
            # perturb the counts (r10: the persist-based shingle cache
            # false-flagged untruncated_reuse on the query after it)
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # plan build itself failed
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            hard_fail.append(name)
            continue
        entry = {
            "python_udf": plan.count("BatchEvalPython"),
            "arrow_stages": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
            "nonbroadcast_cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "n_exchanges": plan.count("Exchange hashpartitioning"),
            "untruncated_reuse": duplicated_signatures(plan),
        }
        if entry["python_udf"] or entry["nonbroadcast_cartesian"]:
            hard_fail.append(name)
        report[name] = entry

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "hard_failures": hard_fail,
        "queries_with_bnlj": [n for n, e in report.items() if e.get("bnlj")],
        "queries_with_arrow": [n for n, e in report.items() if e.get("arrow_stages")],
        "queries_with_untruncated_reuse": [
            n for n, e in report.items() if e.get("untruncated_reuse")
        ],
        "max_exchanges": max(
            (e.get("n_exchanges", 0) for e in report.values()), default=0
        ),
        "queries": report,
    }
    print(json.dumps(summary))
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
