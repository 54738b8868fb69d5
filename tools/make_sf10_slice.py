"""Family-sampled slice of an sf10-shaped directory for the pair-mass
queries whose FULL DuckDB oracle stops fitting at 500k docs (VERDICT r7
ask #4's sampled-key differential).

Sampling unit = the near-dup FAMILY, not the row: make_sfbig derives
replica ids as ``base + c*10_000_000``, so ``id % 10_000_000`` names the
family. Keeping or dropping whole families preserves the pair structure
EXACTLY on the kept slice — every intra-family and kept-cross-family
pair exists on both engines, every pair touching a dropped family is
absent from both — so the differential is still hash-exact, just on a
deterministic 10% of the key space (md5 bucket of the family id).

documents + embeddings are sliced; all other tables copy verbatim.

Usage: python tools/make_sf10_slice.py [src] [dst] [pct]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

FAMILY_MOD = 10_000_000


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf10")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf10s")
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{src}/{table}.parquet/*.parquet')
              WHERE CAST(concat('0x',
                      substring(md5(CAST({idc} % {FAMILY_MOD} AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 < {pct}
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows kept")
    for f in src.iterdir():
        if f.name in ("documents.parquet", "embeddings.parquet"):
            continue
        if f.is_file():
            shutil.copy2(f, dst / f.name)
        else:
            shutil.copytree(f, dst / f.name, dirs_exist_ok=True)
    print("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
