"""Datapipe command line: run the common training-data pipeline stages
against parquet without writing code.

    python -m aces_spark.datapipe.cli <op> [op flags] \\
        [--master local[*]] [--shuffle-partitions N]

Operations (each reads ``--input`` parquet, transforms write ``--output``
parquet; report ops print ONE JSON line to stdout):

    clean     quality-gate + language filter + exact-dedup canonical
              selection            (--min-quality, --lang)
    dedup     exact document dedup: keep the canonical copy per
              fingerprint group    (--text-col)
    split     deterministic train/val/test assignment
              (--train/--val/--test fractions, sum to 1)
    chunk     sliding token-window chunking (--tokens, --stride)
    pack      concat-and-chunk sequence packing (--max-tokens, --part-col)
    mix       target-mix downsampling (--weights lang=w,lang=w, --strata-col)
    validate  data-quality rules report → JSON
              (--rules "not_null:col,unique:col,non_negative:col")
    diff      snapshot diff summary → JSON (--old, --new, --key)
    sketch    distinct-count estimate → JSON (--col, --method kmv|hll)
    sample    weighted sample without replacement (--weight-col, --k)
    score-lm  bigram-LM NLL scoring (--train corpus, scores --input)
    bm25      BM25 top-k search report → JSON (--terms a,b,c, --k)
    merge-scd2  SCD2 history merge (--history, --changes(--input), --key)
    artifacts mojibake/encoding-damage report, or filter with --max-bp
    classify  linear-classifier inference against a weights parquet
              (--weights, --buckets, --bias-micro)

The session knobs mirror the cohort CLI (``aces_spark.cli``): one
SparkSession, parallelism from partitions. Every operation is the
library function documented in ARCHITECTURE.md — the CLI adds zero
logic of its own, so anything scripted here behaves identically when
called from code.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(master: str | None, shuffle_partitions: int | None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("aces-datapipe")
    if master:
        b = b.master(master)
    b = b.config("spark.sql.session.timeZone", "UTC")
    b = b.config("spark.sql.adaptive.enabled", "true")
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def _parse_rules(spec: str) -> list[tuple]:
    rules: list[tuple] = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        kind, _, col = item.partition(":")
        if not col:
            raise SystemExit(f"bad rule {item!r}: expected kind:column")
        rules.append((kind.strip(), col.strip()))
    if not rules:
        raise SystemExit("no rules given")
    return rules


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition("=")
        if not v:
            raise SystemExit(f"bad weight {item!r}: expected name=fraction")
        out[k.strip()] = float(v)
    if not out:
        raise SystemExit("no weights given")
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m aces_spark.datapipe.cli")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="op", required=True)

    def _io(sp, output=True):
        sp.add_argument("--input", required=True)
        if output:
            sp.add_argument("--output", required=True)

    sp = sub.add_parser("clean")
    _io(sp)
    sp.add_argument("--min-quality", type=float, default=0.5)
    sp.add_argument("--lang", default="en")

    sp = sub.add_parser("dedup")
    _io(sp)
    sp.add_argument("--text-col", default="text")

    sp = sub.add_parser("split")
    _io(sp)
    sp.add_argument("--train", type=float, default=0.9)
    sp.add_argument("--val", type=float, default=0.05)
    sp.add_argument("--test", type=float, default=0.05)

    sp = sub.add_parser("chunk")
    _io(sp)
    sp.add_argument("--tokens", type=int, default=512)
    sp.add_argument("--stride", type=int, default=384)

    sp = sub.add_parser("pack")
    _io(sp)
    sp.add_argument("--max-tokens", type=int, default=2048)
    sp.add_argument("--part-col", default="source")

    sp = sub.add_parser("mix")
    _io(sp)
    sp.add_argument("--weights", required=True, help="name=frac,name=frac")
    sp.add_argument("--strata-col", default="lang")

    sp = sub.add_parser("validate")
    _io(sp, output=False)
    sp.add_argument("--rules", required=True)

    sp = sub.add_parser("diff")
    sp.add_argument("--old", required=True)
    sp.add_argument("--new", required=True)
    sp.add_argument("--key", required=True)

    sp = sub.add_parser("sketch")
    _io(sp, output=False)
    sp.add_argument("--col", required=True)
    sp.add_argument("--method", choices=["kmv", "hll"], default="hll")

    sp = sub.add_parser("sample")
    _io(sp)
    sp.add_argument("--weight-col", required=True)
    sp.add_argument("--k", type=int, required=True)
    sp.add_argument("--id-col", default="doc_id")

    sp = sub.add_parser("score-lm")
    _io(sp)
    sp.add_argument("--train", required=True, help="reference corpus parquet")

    sp = sub.add_parser("bm25")
    _io(sp, output=False)
    sp.add_argument("--terms", required=True, help="comma-separated query terms")
    sp.add_argument("--k", type=int, default=10)

    sp = sub.add_parser("merge-scd2")
    _io(sp)
    sp.add_argument("--history", required=True)
    sp.add_argument("--key", required=True)

    sp = sub.add_parser("cms")
    _io(sp, output=False)
    sp.add_argument("--col", required=True)
    sp.add_argument("--probe", help="comma-separated keys to estimate")
    sp.add_argument("--depth", type=int, default=4)
    sp.add_argument("--width", type=int, default=1024)

    sp = sub.add_parser("zorder")
    _io(sp)
    sp.add_argument("--cols", required=True, help="comma-separated integer columns")
    sp.add_argument("--bits", type=int, default=16)
    sp.add_argument("--files", type=int, default=32)

    sp = sub.add_parser("pagerank")
    _io(sp, output=False)
    sp.add_argument("--src", default="src")
    sp.add_argument("--dst", default="dst")
    sp.add_argument("--iterations", type=int, default=3)
    sp.add_argument("--k", type=int, default=20)

    sp = sub.add_parser("decontam")
    _io(sp)
    sp.add_argument("--benchmark", required=True, help="benchmark parquet")
    sp.add_argument("--ngram", type=int, default=8)
    sp.add_argument("--text-col", default="text")
    sp.add_argument(
        "--max-frac",
        type=float,
        default=None,
        help="drop docs with overlap fraction above this; default: report only",
    )

    sp = sub.add_parser("artifacts")
    _io(sp)
    sp.add_argument("--text-col", default="text")
    sp.add_argument(
        "--max-bp",
        type=int,
        default=None,
        help="drop docs whose artifact basis points exceed this; "
        "default: write the full report",
    )

    sp = sub.add_parser("classify")
    _io(sp)
    sp.add_argument("--weights", required=True, help="model parquet (bucket, weight_micro)")
    sp.add_argument("--buckets", type=int, default=1024)
    sp.add_argument("--bias-micro", type=int, default=0)
    sp.add_argument("--text-col", default="text")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = _session(args.master, args.shuffle_partitions)

    if args.op == "clean":
        from .text import clean_corpus

        docs = spark.read.parquet(args.input)
        kept = clean_corpus(docs, min_quality=args.min_quality, lang=args.lang)
        docs.join(kept.select("doc_id"), "doc_id").write.mode("overwrite").parquet(
            args.output
        )
    elif args.op == "dedup":
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from .text import fingerprint_expr

        docs = spark.read.parquet(args.input)
        w = Window.partitionBy("__fp")
        (
            docs.withColumn("__fp", fingerprint_expr(F.col(args.text_col)))
            .withColumn("__canon", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("__canon"))
            .drop("__fp", "__canon")
            .write.mode("overwrite")
            .parquet(args.output)
        )
    elif args.op == "split":
        from .packing import assign_splits

        total = args.train + args.val + args.test
        if abs(total - 1.0) > 1e-9:
            raise SystemExit(f"split fractions sum to {total}, expected 1")
        df = spark.read.parquet(args.input)
        assign_splits(
            df, {"train": args.train, "val": args.val, "test": args.test}
        ).write.mode("overwrite").parquet(args.output)
    elif args.op == "chunk":
        from .chunking import chunk_documents

        df = spark.read.parquet(args.input)
        chunk_documents(
            df, chunk_tokens=args.tokens, stride=args.stride
        ).write.mode("overwrite").parquet(args.output)
    elif args.op == "pack":
        from .packing import pack_sequences

        df = spark.read.parquet(args.input)
        pack_sequences(
            df, max_tokens=args.max_tokens, part_col=args.part_col
        ).write.mode("overwrite").parquet(args.output)
    elif args.op == "mix":
        from .sampling import mix_sample

        df = spark.read.parquet(args.input)
        mix_sample(
            df, _parse_weights(args.weights), strata_col=args.strata_col
        ).write.mode("overwrite").parquet(args.output)
    elif args.op == "validate":
        from .validation import check_rules

        df = spark.read.parquet(args.input)
        rows = check_rules(df, _parse_rules(args.rules)).collect()
        report = {
            r["rule"]: {
                "n_rows": r["n_rows"],
                "n_violations": r["n_violations"],
                "violation_frac": r["violation_frac"],
            }
            for r in rows
        }
        print(json.dumps({"op": "validate", "input": args.input, "rules": report}))
        return 1 if any(v["n_violations"] for v in report.values()) else 0
    elif args.op == "diff":
        from .snapshots import snapshot_diff_summary

        old = spark.read.parquet(args.old)
        new = spark.read.parquet(args.new)
        rows = snapshot_diff_summary(old, new, args.key).collect()
        print(
            json.dumps(
                {
                    "op": "diff",
                    "statuses": {
                        r["status"]: {"n_keys": r["n_keys"], "key_frac": r["key_frac"]}
                        for r in rows
                    },
                }
            )
        )
        return 0
    elif args.op == "sketch":
        from .sketches import hll_distinct, kmv_distinct

        df = spark.read.parquet(args.input)
        fn = hll_distinct if args.method == "hll" else kmv_distinct
        row = fn(df, args.col).collect()[0]
        print(
            json.dumps(
                {"op": "sketch", "method": args.method, "col": args.col,
                 **{k: row[k] for k in row.asDict()}}
            )
        )
        return 0
    elif args.op == "sample":
        from .sampling import weighted_sample

        df = spark.read.parquet(args.input)
        winners = weighted_sample(df, args.weight_col, args.k, id_col=args.id_col)
        df.join(winners.select(args.id_col), args.id_col).write.mode(
            "overwrite"
        ).parquet(args.output)
    elif args.op == "artifacts":
        from .text import encoding_artifacts

        report = encoding_artifacts(
            spark.read.parquet(args.input), text_col=args.text_col
        )
        if args.max_bp is not None:
            docs = spark.read.parquet(args.input)
            keep = report.filter(
                (report["artifact_bp"] <= args.max_bp)
            ).select("doc_id")
            docs.join(keep, "doc_id", "left_semi").write.mode(
                "overwrite"
            ).parquet(args.output)
        else:
            report.write.mode("overwrite").parquet(args.output)
    elif args.op == "classify":
        from ..functions.features import linear_classifier_score

        linear_classifier_score(
            spark.read.parquet(args.input),
            spark.read.parquet(args.weights),
            n_buckets=args.buckets,
            bias_micro=args.bias_micro,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.output)
    elif args.op == "score-lm":
        from .lm import score_documents_lm, train_bigram_lm

        model = train_bigram_lm(spark.read.parquet(args.train))
        score_documents_lm(spark.read.parquet(args.input), model).write.mode(
            "overwrite"
        ).parquet(args.output)
    elif args.op == "bm25":
        from .retrieval import bm25_scores

        df = spark.read.parquet(args.input)
        terms = [t for t in args.terms.split(",") if t.strip()]
        rows = bm25_scores(df, terms, top_k=args.k).collect()
        print(
            json.dumps(
                {"op": "bm25", "terms": terms,
                 "hits": [r.asDict() for r in rows]}
            )
        )
        return 0
    elif args.op == "merge-scd2":
        from .cdc import scd2_merge

        history = spark.read.parquet(args.history)
        changes = spark.read.parquet(args.input)
        scd2_merge(history, changes, args.key).write.mode("overwrite").parquet(
            args.output
        )
    elif args.op == "cms":
        from pyspark.sql import functions as F

        from .sketches import cms_lookup, cms_registers

        df = spark.read.parquet(args.input)
        regs = cms_registers(df, args.col, depth=args.depth, width=args.width)
        if args.probe:
            keys = spark.createDataFrame(
                [(k,) for k in args.probe.split(",")], f"{args.col} string"
            )
            probed = keys.select(F.col(args.col).cast(dict(df.dtypes)[args.col]))
            rows = cms_lookup(
                regs, probed, args.col, depth=args.depth, width=args.width
            ).collect()
            print(json.dumps({"op": "cms", "estimates": [r.asDict() for r in rows]}))
        else:
            print(
                json.dumps(
                    {"op": "cms", "depth": args.depth, "width": args.width,
                     "n_registers": regs.count()}
                )
            )
        return 0
    elif args.op == "zorder":
        from pyspark.sql import functions as F

        from ..sources.layout import zorder_layout

        df = spark.read.parquet(args.input)
        cols = [F.col(c.strip()) for c in args.cols.split(",") if c.strip()]
        zorder_layout(df, cols, bits=args.bits, num_files=args.files).write.mode(
            "overwrite"
        ).parquet(args.output)
    elif args.op == "pagerank":
        from ..operators.graph import pagerank_topk

        edges = spark.read.parquet(args.input)
        rows = pagerank_topk(
            edges, args.src, args.dst, k=args.k, iterations=args.iterations
        ).collect()
        print(json.dumps({"op": "pagerank", "top": [r.asDict() for r in rows]}))
        return 0
    elif args.op == "decontam":
        from pyspark.sql import functions as F

        from .decontam import contamination_fraction

        corpus = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.benchmark)
        report = contamination_fraction(
            corpus, bench, n=args.ngram, text_col=args.text_col
        )
        if args.max_frac is None:
            report.write.mode("overwrite").parquet(args.output)
        else:
            # keep-clean mode: docs above the contamination cap are
            # dropped; short docs (no shingles) have no fraction and are
            # kept — absence of evidence, the report form's convention
            bad = report.filter(F.col("frac") > args.max_frac).select("doc_id")
            corpus.join(bad, "doc_id", "left_anti").write.mode(
                "overwrite"
            ).parquet(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
