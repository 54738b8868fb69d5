"""sf10 scale-rung probe for the pair-mass family (r7 verdict ask #4).

Two kinds of evidence, both against the 100×-sf0.1 directory that
``tools/make_sfbig.py`` synthesizes (500k docs / 200k embeddings / 10M
events — the rung where single-node DuckDB oracles stop fitting the
pair-mass queries):

1. **Sampled-key differential (tier A)** — queries whose OUTPUT set is
   corpus-independent (pair emitted iff a predicate of the two rows
   alone holds: exact Jaccard >= t, Hamming <= k, signature-band
   collision). Spark runs on the FULL sf10 directory; its output is
   filtered to pairs whose BOTH endpoint families survive the
   deterministic 10% md5 family sample (``tools/make_sf10_slice.py``);
   DuckDB runs the registry oracle on the sliced directory. Because
   family membership decides presence identically on both engines, the
   filtered-full-run and the oracle-on-slice must agree hash-exactly —
   so the slice verifies the *sf10 run itself*, not a smaller rerun.

2. **Full-scale run record (tier B)** — queries whose output depends on
   corpus-global state (IDF weights, trained centroids, document-
   frequency caps that bind at 100× df): the full-sf10 run records
   wall / rows / exchange count (plan-stability evidence); value
   correctness for these comes from the separate slice sweep
   (``check_oracle.py .scaledata/sf10s``), where both engines see the
   same corpus.

Family arithmetic: make_sfbig derives replica ids as base + c*1e7, and
the registry's near-dup augmentation adds +1e6 to a perturbed copy's id
— so an endpoint id's base family is ``m - 1e6 if m >= 1e6 else m``
with ``m = id % 1e7`` (base ids are < 1e6 at any sf this tool targets).

Usage: python tools/sf10_probe.py [sf10_dir] [slice_dir] [pct] [query ...]

Run ONE query per invocation when probing the heavy tail — shuffle
spill from a 1e8+-candidate query lives until the JVM exits, and two
heavy queries' spill in one process can exceed the host's scratch disk.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from check_oracle import TABLES, frame_key  # noqa: E402

FAMILY_MOD = 10_000_000
AUG_OFFSET = 1_000_000

# (id column A, id column B) of the pair output
TIER_A = {
    "prefix_jaccard": ("doc_a", "doc_b"),
    "simhash_near_pairs": ("doc_a", "doc_b"),
    "minhash_lsh_pairs": ("doc_a", "doc_b"),
    "hamming_near_pairs": ("media_a", "media_b"),
}
TIER_B = [
    "tfidf_cosine_dups",
    "containment_pairs",
    "ngram_jaccard_pairs",
    "semantic_dedup",
]


def keep_sql(col: str, pct: int) -> str:
    """Spark-SQL predicate mirroring make_sf10_slice's family sample."""
    base = (
        f"(CASE WHEN {col} % {FAMILY_MOD} >= {AUG_OFFSET} "
        f"THEN {col} % {FAMILY_MOD} - {AUG_OFFSET} "
        f"ELSE {col} % {FAMILY_MOD} END)"
    )
    return (
        f"(CAST(conv(substring(md5(CAST({base} AS STRING)), 1, 15), 16, 10) "
        f"AS BIGINT) % 100 < {pct})"
    )


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf10"
    slc = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf10s"
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    cpus = os.environ.get("ORACLE_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf10-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("ORACLE_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{slc}/{t}.parquet"
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    report = {}
    fails = 0

    for name, (ca, cb) in TIER_A.items():
        if only and name not in only:
            continue
        df = queries[name](spark, sf10)
        # persist the (small) RESULT so the sampled-key filter below
        # reads the cache instead of replaying the corpus-sized shuffle
        df = df.persist()
        t0 = time.monotonic()
        n_full = df.count()
        wall = time.monotonic() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        nex = plan.count("Exchange hashpartitioning")

        srows = [
            tuple(r)
            for r in df.filter(
                f"{keep_sql(ca, pct)} AND {keep_sql(cb, pct)}"
            ).collect()
        ]
        df.unpersist()
        rel = con.sql(oracles[name])
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        ok = (
            sorted(df.columns) == sorted(dcols)
            and len(srows) == len(drows)
            and frame_key(srows, df.columns) == frame_key(drows, dcols)
        )
        fails += 0 if ok else 1
        report[name] = {
            "tier": "A",
            "wall_s": round(wall, 1),
            "rows_full": n_full,
            "rows_sampled": len(srows),
            "exchanges": nex,
            "differential": "PASS" if ok else "FAIL",
        }
        print(json.dumps({name: report[name]}))

    for name in TIER_B:
        if only and name not in only:
            continue
        df = queries[name](spark, sf10)
        t0 = time.monotonic()
        n_full = df.count()
        wall = time.monotonic() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        report[name] = {
            "tier": "B",
            "wall_s": round(wall, 1),
            "rows_full": n_full,
            "exchanges": plan.count("Exchange hashpartitioning"),
            "differential": "see slice sweep",
        }
        print(json.dumps({name: report[name]}))

    print(json.dumps(report, indent=1))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
