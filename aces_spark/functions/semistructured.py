"""Semi-structured (JSON) column handling.

Event streams carry a free-form properties column (``events.props`` in
the synthetic schema); the engine's rule for it is TYPED extraction:
``from_json`` with an explicit schema, which Catalyst evaluates JVM-side
inside whole-stage codegen and — because the schema is declared, not
discovered — prunes to exactly the requested fields at parse time.
Never ``get_json_object`` per field (re-parses the string once per
call), never a Python ``json.loads`` UDF (the 10-100× slow path).

At 100 TB the parse cost is the scan cost; everything downstream of
``extract_json_fields`` is ordinary typed columns with ordinary
pushdown/pruning/aggregation behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_json_fields", "json_field_stats"]


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    schema: str,
    prefix: str = "",
    drop_source: bool = True,
) -> DataFrame:
    """Parse ``json_col`` with the DDL ``schema`` (e.g. ``"k BIGINT,
    tag STRING"``) and flatten each declared field to a top-level column
    (optionally ``prefix``-ed). Malformed rows yield nulls (``from_json``
    PERMISSIVE default) — they stay countable rather than killing a 100 TB
    job.

    One ``from_json`` per row regardless of field count; the parser
    materializes only the declared fields.
    """
    parsed = df.withColumn("__parsed", F.from_json(F.col(json_col), schema))
    fields = [f.name for f in parsed.schema["__parsed"].dataType.fields]
    out_cols = [c for c in df.columns if not (drop_source and c == json_col)]
    return parsed.select(
        *out_cols,
        *[F.col(f"__parsed.{f}").alias(f"{prefix}{f}") for f in fields],
    )


def json_field_stats(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    field_type: str = "BIGINT",
    by: str = "event_type",
) -> DataFrame:
    """Per-group stats of one typed JSON field: row count, nulls (absent
    key OR malformed document), min/max/sum — the profiling pass run
    before promoting a JSON field to a real column. All-integer output
    for ``BIGINT`` fields (engine-exact)."""
    e = extract_json_fields(df, json_col, f"{field} {field_type}")
    v = F.col(field)
    return e.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
    )
