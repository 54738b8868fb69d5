"""Command-line entry point (reference: ``aces-cli``, ``src/aces/run.py:121-180``).

The reference shards work across OS processes via Hydra multirun; here one
Spark job reads the whole shard directory and partitioning replaces
process-level parallelism, so the CLI is a thin argparse wrapper:

    python -m aces_spark.cli --config task.yaml --data /path/to/meds \\
        --standard meds --output out.parquet [--meds-labels] \\
        [--predicates overlay.yaml] [--window-stats stats.parquet]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="aces-spark",
        description="Extract a cohort from an event-stream dataset using a YAML task config.",
    )
    p.add_argument("--config", required=True, help="Path to the YAML task configuration.")
    p.add_argument("--predicates", default=None, help="Optional predicates overlay YAML.")
    p.add_argument("--data", required=True, help="Input path (file, directory of shards, or glob).")
    p.add_argument("--standard", default="meds", choices=["meds", "direct", "esgpt"])
    p.add_argument("--ts-format", default=None, help="strptime format for direct-mode string timestamps.")
    p.add_argument("--output", required=True, help="Output parquet path.")
    p.add_argument("--meds-labels", action="store_true", help="Coerce output to the MEDS label schema.")
    p.add_argument("--window-stats", default=None, help="Optional path for the raw window-struct output.")
    p.add_argument("--master", default=None, help="Spark master override (default: existing session or local[*]).")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    # surface the engine's sanity lines (cohort size, label-uniformity
    # warning) on the console like the reference CLI does — scoped to the
    # aces_spark namespace so Spark/py4j INFO chatter stays quiet
    import logging

    pkg_log = logging.getLogger("aces_spark")
    if not pkg_log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        pkg_log.addHandler(handler)
        pkg_log.setLevel(logging.INFO)

    from pyspark.sql import SparkSession

    from .config import TaskExtractorConfig
    from .query import query, report_cohort_stats
    from .sources.predicates import get_predicates_df
    from .sources.sinks import write_result

    builder = SparkSession.builder.appName("aces-spark")
    if args.master:
        builder = builder.master(args.master)
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    cfg = TaskExtractorConfig.load(args.config, args.predicates)
    predicates_df = get_predicates_df(
        cfg, spark, args.data, standard=args.standard, ts_format=args.ts_format
    )
    # persist so the sanity report reuses the written result instead of
    # re-running the whole extraction
    result = query(cfg, predicates_df).persist()
    try:
        write_result(
            result,
            args.output,
            meds_labels=args.meds_labels and args.standard == "meds",
            window_stats_path=args.window_stats,
        )
        report_cohort_stats(result)
    finally:
        result.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
