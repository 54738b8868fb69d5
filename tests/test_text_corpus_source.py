"""JSONL corpus source: explicit schema, corrupt-line capture, report."""

from __future__ import annotations

import gzip
import json


from aces_spark.sources.text_corpus import (
    DOC_SCHEMA,
    corpus_read_report,
    read_documents_jsonl,
)


def _write_jsonl(path, rows, corrupt_lines=()):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for line in corrupt_lines:
            f.write(line + "\n")


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"},
        {"doc_id": 2, "text": "", "lang": "de", "source": "books"},
        {"doc_id": None, "text": "orphan", "lang": "en", "source": "web"},
    ]
    p = str(tmp_path / "docs.jsonl")
    _write_jsonl(p, rows, corrupt_lines=['{"doc_id": 4, "text": bad', "not json"])

    df = read_documents_jsonl(spark, p)
    assert df.schema.fieldNames() == ["doc_id", "text", "lang", "source"]
    good = {r["doc_id"]: r["text"] for r in df.collect() if r["doc_id"] is not None}
    assert good == {1: "hello world", 2: ""}
    assert df.count() == 5  # corrupt lines survive as null-data rows

    kept = read_documents_jsonl(spark, p, keep_corrupt=True)
    (rep,) = corpus_read_report(kept).collect()
    assert (rep["n_rows"], rep["n_corrupt"]) == (5, 2)
    assert rep["n_null_id"] == 3  # the None row + the 2 corrupt rows
    assert rep["n_empty_text"] == 3  # doc 2 + the 2 corrupt rows


def test_jsonl_gz_shards_and_glob(spark, tmp_path):
    for shard in range(2):
        rows = [
            {"doc_id": shard * 10 + i, "text": f"doc {shard}-{i}",
             "lang": "en", "source": "s"}
            for i in range(3)
        ]
        with gzip.open(tmp_path / f"part-{shard}.jsonl.gz", "wt") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    df = read_documents_jsonl(spark, str(tmp_path / "part-*.jsonl.gz"))
    assert df.count() == 6
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2, 10, 11, 12]


def test_jsonl_custom_schema_feeds_datapipe(spark, tmp_path):
    from pyspark.sql import types as T

    from aces_spark.datapipe.text import encoding_artifacts

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    p = str(tmp_path / "min.jsonl")
    _write_jsonl(p, [{"doc_id": 7, "text": "ok"}])
    df = read_documents_jsonl(spark, p, schema=schema)
    (row,) = encoding_artifacts(df).collect()
    assert (row["doc_id"], row["is_damaged"]) == (7, False)
