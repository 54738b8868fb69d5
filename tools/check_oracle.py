"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf directory, compare row count, column names, and order-insensitive
values (exact; floats compared by repr after both engines' own rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Progress: a ``[ k/N  elapsed  eta ]`` line is written to stderr before
each query starts (the judge's 184-query sweep runs ~25 min — r8
verdict nit #3), and every PASS/FAIL line carries the query's wall
time. Tables are auto-detected from the sf directory (file OR Spark
part-file directory), so the same command sweeps the driver testdata
and tools/make_sfbig.py output (sf10/sf10s) alike.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    import os

    cpus = os.environ.get("ORACLE_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", cpus)
        # local mode = ONE jvm; the 1g default heap OOMs on 10x-scale
        # sweeps (sf1 containment's ~280M-row pair mass found this)
        .config(
            "spark.driver.memory", os.environ.get("ORACLE_DRIVER_MEM", "8g")
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    missing = []
    for t in TABLES:
        # driver testdata is one file per table; Spark-written tables
        # (e.g. tools/make_sfbig.py output) are part-file DIRECTORIES —
        # glob those so the oracle reads the same rows Spark does
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        elif not Path(p).exists():
            missing.append(t)
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    if missing:
        print(f"note: tables absent in {sf_dir}: {', '.join(missing)} "
              "(queries touching them will FAIL)", file=sys.stderr)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    todo = [(n, f) for n, f in queries.items() if not only or n in only]
    n_total = len(todo)
    t_sweep = time.monotonic()

    n_pass = n_fail = n_rows_only = 0
    for k, (name, fn) in enumerate(todo, 1):
        elapsed = time.monotonic() - t_sweep
        eta = elapsed / (k - 1) * (n_total - k + 1) if k > 1 else 0.0
        print(
            f"[ {k}/{n_total}  elapsed {elapsed:6.0f}s  "
            f"eta {eta:6.0f}s ] {name}",
            file=sys.stderr,
            flush=True,
        )
        t_q = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)"
                  f" [{time.monotonic() - t_q:.1f}s]")
            n_rows_only += 1
            continue

        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"row count: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            sk = frame_key(srows, scols)
            dk = frame_key(drows, dcols)
            if sk != dk:
                diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows"
                  f" [{time.monotonic() - t_q:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
