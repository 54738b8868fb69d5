"""Tests for functions/semistructured.py and the partitioned sink."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from aces_spark.functions.semistructured import extract_json_fields, json_field_stats
from aces_spark.sources.sinks import write_partitioned


class TestExtractJsonFields:
    def test_typed_fields_and_malformed_rows(self, spark):
        df = spark.createDataFrame(
            [
                Row(id=1, props='{"k": 5, "tag": "a"}'),
                Row(id=2, props='{"k": 7}'),
                Row(id=3, props="not json"),
                Row(id=4, props=None),
            ]
        )
        out = extract_json_fields(df, "props", "k BIGINT, tag STRING")
        assert out.columns == ["id", "k", "tag"]
        got = {r["id"]: (r["k"], r["tag"]) for r in out.collect()}
        assert got == {1: (5, "a"), 2: (7, None), 3: (None, None), 4: (None, None)}

    def test_prefix_and_keep_source(self, spark):
        df = spark.createDataFrame([Row(id=1, props='{"k": 1}')])
        out = extract_json_fields(df, "props", "k BIGINT", prefix="p_", drop_source=False)
        assert out.columns == ["id", "props", "p_k"]

    def test_field_stats(self, spark):
        df = spark.createDataFrame(
            [
                Row(event_type="a", props='{"k": 1}'),
                Row(event_type="a", props='{"k": 3}'),
                Row(event_type="a", props="bad"),
                Row(event_type="b", props='{"k": 10}'),
            ]
        )
        got = {
            r["event_type"]: (r["n_rows"], r["n_null"], r["min_v"], r["max_v"], r["sum_v"])
            for r in json_field_stats(df).collect()
        }
        assert got == {"a": (3, 1, 1, 3, 4), "b": (1, 0, 10, 10, 10)}

    def test_single_parse_in_plan(self, spark):
        df = spark.createDataFrame([Row(id=1, props='{"k": 1, "t": "x"}')])
        plan = (
            extract_json_fields(df, "props", "k BIGINT, t STRING")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("from_json") == 1  # one parse, many fields


class TestWritePartitioned:
    def test_hive_layout_and_pruned_read(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, ["train", "val"][i % 2], i * 10) for i in range(20)],
            "doc_id long, split string, n long",
        )
        path = str(tmp_path / "lake")
        write_partitioned(df, path, ["split"], sort_cols=["doc_id"])
        assert sorted(
            d for d in os.listdir(path) if d.startswith("split=")
        ) == ["split=train", "split=val"]
        back = spark.read.parquet(path).filter(F.col("split") == "train")
        assert back.count() == 10
        # static pruning: the partition filter reaches the scan (the data
        # filter list stays empty — split never touches row groups)
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters")[1][:120]

    def test_max_records_per_file(self, spark, tmp_path):
        df = spark.createDataFrame([(i, "s") for i in range(10)], "i long, g string")
        path = str(tmp_path / "capped")
        write_partitioned(
            df.coalesce(1), path, ["g"], max_records_per_file=3
        )
        files = [
            f for f in os.listdir(os.path.join(path, "g=s")) if f.endswith(".parquet")
        ]
        assert len(files) >= 4  # 10 rows / cap 3


class TestCompactParquet:
    def test_many_small_files_become_few(self, spark, tmp_path):
        from aces_spark.sources.sinks import compact_parquet

        src = str(tmp_path / "small")
        spark.range(1000).repartition(20).write.parquet(src)
        n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        assert n_src == 20

        out = str(tmp_path / "compacted")
        n_out = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
        assert n_out == 1
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) == 1
        assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == list(
            range(1000)
        )


class TestJsonlCorruptSchema:
    def test_user_schema_gains_corrupt_record(self, spark, tmp_path):
        from aces_spark.sources.sinks import read_jsonl

        p = tmp_path / "data.jsonl"
        p.write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
        df = read_jsonl(spark, str(p), schema="doc_id long, text string")
        assert "_corrupt_record" in df.columns
        rows = df.collect()
        corrupt = [r for r in rows if r["_corrupt_record"] is not None]
        assert len(corrupt) == 1 and corrupt[0]["doc_id"] is None


class TestCompactNonLocal:
    def test_unsizable_dataset_requires_explicit_target(self, spark, tmp_path, monkeypatch):
        from aces_spark.sources import sinks
        from aces_spark.sources.sinks import compact_parquet

        src = str(tmp_path / "src")
        spark.range(10).write.parquet(src)
        # simulate an object-store dataset: no file:-scheme inputFiles
        real_read = spark.read.parquet

        class FakeDF:
            def __init__(self, df):
                self._df = df

            def inputFiles(self):
                return ["s3://bucket/part-0.parquet"]

            def __getattr__(self, item):
                return getattr(self._df, item)

        import pytest as _pt

        class FakeReader:
            def parquet(self, p):
                return FakeDF(real_read(p))

        monkeypatch.setattr(type(spark), "read", property(lambda self: FakeReader()))
        with _pt.raises(ValueError, match="n_output_files"):
            compact_parquet(spark, src, str(tmp_path / "out"))
        # explicit target works regardless of scheme
        n = compact_parquet(spark, src, str(tmp_path / "out2"), n_output_files=2)
        assert n == 2
