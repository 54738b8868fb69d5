"""Text-corpus sources: JSONL (and gzipped JSONL) document readers with
EXPLICIT schemas — the wire format most public corpora actually ship
(C4, The Pile, RedPajama, Dolma, FineWeb are all JSON-lines).

Scale rules baked in:

* **No schema inference.** ``spark.read.json`` without a schema runs a
  full extra pass over the data to infer one — at 100 TB that doubles
  the read before work starts, and a single malformed row can flip a
  column's inferred type between runs. Callers pass column types (or
  take the conventional default) and Spark parses straight into them.
* **PERMISSIVE + corrupt-record capture.** Crawled JSONL always has
  broken lines; failing the job on row 40 billion is not an option.
  Malformed rows land in ``_corrupt_record`` (kept only when
  ``keep_corrupt=True``) instead of killing the read, and
  :func:`corpus_read_report` counts them so the ingest is observable.
* **Line-splittable.** Plain ``.jsonl`` and block-gzipped shards both
  parallelize by file; Spark splits uncompressed JSONL by range. One
  giant ``.jsonl.gz`` is ONE task — the docstring warns, the reader
  cannot fix the upstream layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOC_SCHEMA", "read_documents_jsonl", "corpus_read_report"]

# the conventional documents-table shape the datapipe operators expect
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus into the conventional ``documents``
    shape with an explicit schema (default :data:`DOC_SCHEMA`) —
    never inference. Malformed lines survive as rows whose data columns
    are null; pass ``keep_corrupt=True`` to also keep the raw line in
    ``_corrupt_record`` for quarantine (otherwise the column is
    dropped so downstream schemas stay clean).

    Accepts a file, a directory of shards, or a glob; ``.gz`` shards
    work but each is a single task — shard the upstream corpus, don't
    concatenate it.
    """
    schema = schema if schema is not None else DOC_SCHEMA
    # copy: StructType.add MUTATES in place — adding to the caller's (or
    # the shared default) schema would poison every later read
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if not keep_corrupt:
        df = df.drop("_corrupt_record")
    return df


def corpus_read_report(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ONE-row ingest observability report for a corpus read with
    ``keep_corrupt=True``: ``(n_rows, n_corrupt, n_null_id, n_empty_text)``
    — the numbers that decide whether an ingest is usable before any
    operator runs. Single aggregate, map-side partials, no shuffle of
    the corpus."""
    has_corrupt = "_corrupt_record" in df.columns
    corrupt = (
        F.count(F.col("_corrupt_record")) if has_corrupt else F.lit(0)
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        corrupt.cast("long").alias("n_corrupt"),
        F.count(F.when(F.col(id_col).isNull(), 1)).cast("long").alias("n_null_id"),
        F.count(F.when(F.length(F.coalesce(F.col("text"), F.lit(""))) == 0, 1))
        .cast("long")
        .alias("n_empty_text"),
    )
