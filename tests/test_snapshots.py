"""Tests for datapipe/snapshots.py — cross-snapshot diffing."""

from __future__ import annotations

from pyspark.sql import Row

from aces_spark.datapipe.snapshots import snapshot_diff, snapshot_diff_summary


def _snapshots(spark):
    old = spark.createDataFrame(
        [
            Row(doc_id=1, text="same", source="a"),
            Row(doc_id=2, text="will change", source="a"),
            Row(doc_id=3, text="will vanish", source="b"),
            Row(doc_id=4, text=None, source="b"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text="same", source="a"),
            Row(doc_id=2, text="CHANGED", source="a"),
            Row(doc_id=4, text=None, source="b"),
            Row(doc_id=5, text="brand new", source="c"),
        ]
    )
    return old, new


def test_statuses(spark):
    old, new = _snapshots(spark)
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new, "doc_id").collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # null compares equal to null via the sentinel
        5: "added",
    }


def test_null_vs_empty_not_confused(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "")], "k long, v string")
    got = snapshot_diff(old, new, "k").collect()[0]["status"]
    assert got == "changed"


def test_compare_cols_subset(spark):
    old, new = _snapshots(spark)
    # compare only `source` -> doc 2's text edit is invisible
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new, "doc_id", ["source"]).collect()}
    assert got[2] == "unchanged"


def test_summary_stable_schema_and_fracs(spark):
    old, new = _snapshots(spark)
    rows = {r["status"]: (r["n_keys"], r["key_frac"]) for r in snapshot_diff_summary(old, new, "doc_id").collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    assert rows["added"] == (1, 0.2)
    assert rows["removed"] == (1, 0.2)
    assert rows["changed"] == (1, 0.2)
    assert rows["unchanged"] == (2, 0.4)


def test_summary_zero_statuses_present(spark):
    df = spark.createDataFrame([Row(k=1, v="x")])
    rows = {r["status"]: r["n_keys"] for r in snapshot_diff_summary(df, df, "k").collect()}
    assert rows == {"added": 0, "removed": 0, "changed": 0, "unchanged": 1}
