"""Structured Streaming tests: the streaming pipeline stages must produce
exactly the batch results when driven with availableNow over a file source
(stream/batch parity — the point of defining them as pure DataFrame
transformations)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from aces_spark import PlainPredicateConfig
from aces_spark.streaming.pipeline import (
    evaluate_predicates_stream,
    sessionized_counts,
    trigger_alerts,
    windowed_predicate_counts,
)

SCHEMA = "subject_id long, timestamp timestamp, code string, numeric_value float"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_events")
    base = datetime(2024, 1, 1)
    rows = []
    for sid in (1, 2, 3):
        for i in range(40):
            code = ["admission", "lab", "lab", "discharge", "death"][i % 5]
            rows.append((sid, base + timedelta(minutes=7 * i + sid), code, float(i)))
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.mode("overwrite").parquet(str(root))
    return str(root)


PREDS = {
    "admission": PlainPredicateConfig("admission"),
    "death": PlainPredicateConfig("death"),
}


def _run_stream(spark, events_dir, transform, tmp_path, name):
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    out = transform(evaluate_predicates_stream(stream, PREDS))
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "alerts" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _batch(spark, events_dir, transform):
    batch = spark.read.schema(SCHEMA).parquet(events_dir)
    return transform(evaluate_predicates_stream(batch, PREDS))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_counts_stream_batch_parity(spark, events_dir, tmp_path):
    transform = lambda pe: windowed_predicate_counts(pe, window="1 hour")  # noqa: E731
    got = _run_stream(spark, events_dir, transform, tmp_path, "win_counts")
    want = _batch(spark, events_dir, transform)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(_sorted_rows(got)) > 0


def test_session_counts_stream_batch_parity(spark, events_dir, tmp_path):
    transform = lambda pe: sessionized_counts(pe, gap="15 minutes")  # noqa: E731
    got = _run_stream(spark, events_dir, transform, tmp_path, "sess_counts")
    want = _batch(spark, events_dir, transform)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(_sorted_rows(got)) > 0


def test_trigger_alerts_stream(spark, events_dir, tmp_path):
    transform = lambda pe: trigger_alerts(pe, "admission")  # noqa: E731
    got = _run_stream(spark, events_dir, transform, tmp_path, "alerts")
    want = _batch(spark, events_dir, transform)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(_sorted_rows(got)) == 24  # 8 admissions x 3 subjects
