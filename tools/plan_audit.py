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

Exit code 1 if any query trips ``python_udf`` or
``nonbroadcast_cartesian`` (the two hard bans).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
        "max_exchanges": max(
            (e.get("n_exchanges", 0) for e in report.values()), default=0
        ),
        "queries": report,
    }
    print(json.dumps(summary))
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
