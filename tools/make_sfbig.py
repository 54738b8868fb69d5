"""Synthesize an sf1-shaped directory by deterministically scaling the
driver's sf0.1 tables ~10x — the scale-sensitive tables (events,
documents, embeddings) get ``copies`` id-shifted replicas; the TPC-H
dimension/fact tables are copied verbatim (the scale sweep targets
dedup/ANN/graph/kernel queries, not the classics).

Replicas are PERTURBED, not byte-identical, so the scaled corpus keeps
the source's workload shape instead of degenerating into
everything-is-a-dup / all-scores-tie:

* events   — user_id += c*10_000, event_id += c*1_000_000 (10x users,
             per-user stream shape unchanged)
* documents — doc_id += c*10_000_000, text gets a distinct ' rep<c>'
             tail token (n_chars recomputed), so near-dup families have
             ~`copies` members instead of exact-dup storms
* embeddings — vec_id += c*10_000_000, coord 0 += c*1e-3 (breaks exact
             score ties that would make top-k order engine-dependent)

Both Spark and the DuckDB oracle read the SAME generated parquet, so
generation only needs determinism, not an SQL mirror. Output goes under
the repo (gitignored): the harness testdata is read-only.

Usage: python tools/make_sfbig.py [src_dir] [dst_dir] [copies] [doc_mode]

``doc_mode`` (documents only): ``tail`` (default — replicas are
near-dups of each other, the sf1 sweep shape) or ``spread`` (every 4th
token replaced per-replica — same-family replicas share <50% of their
shingles, keeping the near-dup rate realistic at copies=100 where the
tail mode degenerates into 100-member duplicate storms whose Θ(family²)
true-pair mass no engine can avoid materializing).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VERBATIM = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    doc_mode = sys.argv[4] if len(sys.argv) > 4 else "tail"
    if doc_mode not in ("tail", "spread"):
        raise SystemExit("doc_mode must be 'tail' or 'spread'")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dst.mkdir(parents=True, exist_ok=True)
    for name in VERBATIM:
        out = dst / f"{name}.parquet"
        if out.is_dir():
            shutil.rmtree(out)
        shutil.copy(src / f"{name}.parquet", out)

    def replicate(df, shifts):
        parts = []
        for c in range(copies):
            cur = df
            for col, expr in shifts(c).items():
                cur = cur.withColumn(col, expr)
            parts.append(cur)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    ev = spark.read.parquet(str(src / "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) source
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    replicate(
        ev,
        lambda c: {
            "event_id": F.col("event_id") + F.lit(c * 1_000_000),
            "user_id": F.col("user_id") + F.lit(c * 10_000),
        },
    ).coalesce(8).write.mode("overwrite").parquet(str(dst / "events.parquet"))

    def doc_text(c):
        if c == 0:
            return F.col("text")
        if doc_mode == "tail":
            return F.concat(F.col("text"), F.lit(f" rep{c}"))
        # "spread": replace every 4th token (offset c % 4) with a
        # replica-unique token — same-family replicas then share < 50%
        # of their 3-gram shingles, so the near-dup structure stays the
        # ~20% the registry's aug step plants instead of a 100-member
        # everything-duplicates storm (whose Θ(family²) TRUE pair mass
        # at copies=100 is a property of the data, not of any plan —
        # ~3.5e7 output pairs and a 400 GB candidate shuffle that a
        # cluster absorbs but a single host's disk does not)
        return F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda tok, i: F.when(
                    (i + c) % 4 == 0, F.lit(f"r{c}")
                ).otherwise(tok),
            ),
            " ",
        )

    docs = spark.read.parquet(str(src / "documents.parquet"))
    replicate(
        docs,
        lambda c: {
            "doc_id": F.col("doc_id") + F.lit(c * 10_000_000),
            "text": doc_text(c),
            "n_chars": F.length(doc_text(c)).cast("long"),
        },
    ).coalesce(8).write.mode("overwrite").parquet(str(dst / "documents.parquet"))

    emb = spark.read.parquet(str(src / "embeddings.parquet"))
    replicate(
        emb,
        lambda c: {
            "vec_id": F.col("vec_id") + F.lit(c * 10_000_000),
            "embedding": F.when(F.lit(c == 0), F.col("embedding")).otherwise(
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.lit(c * 1e-3)).cast("float")
                    ),
                    F.slice("embedding", 2, 1_000_000),
                )
            ),
        },
    ).coalesce(8).write.mode("overwrite").parquet(str(dst / "embeddings.parquet"))

    for name in ["events", "documents", "embeddings"]:
        n = spark.read.parquet(str(dst / f"{name}.parquet")).count()
        print(f"{name}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
