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


def test_dedup_stream_batch_parity(spark, tmp_path):
    """Streaming exact dedup keeps exactly one doc per content fingerprint
    and agrees with the batch path on the surviving fingerprint set."""
    from datetime import datetime, timedelta

    from aces_spark.streaming.pipeline import dedup_stream

    schema = "doc_id long, ts timestamp, text string"
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, "The quick brown fox!"),
        (2, base + timedelta(minutes=1), "the quick brown fox"),  # dup of 1 (normalized)
        (3, base + timedelta(minutes=2), "something else entirely"),
        (4, base + timedelta(minutes=3), "SOMETHING ELSE ENTIRELY"),  # dup of 3
        (5, base + timedelta(minutes=4), "a third unique document"),
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        dedup_stream(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_docs").collect()

    batch = dedup_stream(spark.read.schema(schema).parquet(str(src))).collect()
    assert len(got) == 3 and len(batch) == 3
    assert {r["fingerprint"] for r in got} == {r["fingerprint"] for r in batch}


def test_dedup_stream_batch_deterministic(spark):
    """The batch path must keep the SAME row per fingerprint regardless of
    partitioning (min by (ts, rest)) — not dropDuplicates' arbitrary
    winner."""
    from datetime import datetime, timedelta

    from aces_spark.streaming.pipeline import dedup_stream

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=i), "same content " + ("a" if i % 2 else "A"))
        for i in range(40)
    ]  # all 40 rows share one normalized fingerprint
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    kept = [
        {(r["doc_id"], r["ts"]) for r in dedup_stream(df.repartition(p), ts_col="ts").collect()}
        for p in (1, 7, 32)
    ]
    assert kept[0] == kept[1] == kept[2]
    assert kept[0] == {(0, base)}  # earliest event time wins


def test_open_window_tracker_matches_batch_kernel(spark, tmp_path):
    """The stateful tracker (applyInPandasWithState) must agree with the
    batch event-bound kernel (row_to_bound, closed='right') on trigger rows
    with a resolved boundary — including windows that span micro-batch
    boundaries (state carried across files via maxFilesPerTrigger=1)."""
    from pyspark.sql import functions as F

    from aces_spark.operators.aggregate import boolean_expr_bound_sum
    from aces_spark.streaming.pipeline import open_window_tracker

    base = datetime(2024, 3, 1)
    schema = "subject_id long, timestamp timestamp, adm long, dis long, lab long"
    # file 1: admissions + labs (windows left OPEN at the batch boundary);
    # file 2: more labs + discharges (close them), plus a same-row
    # trigger+boundary event and a never-closed admission
    f1 = [
        (1, base + timedelta(hours=0), 1, 0, 0),
        (1, base + timedelta(hours=2), 0, 0, 1),
        (2, base + timedelta(hours=1), 1, 0, 0),
        (2, base + timedelta(hours=3), 0, 0, 1),
    ]
    f2 = [
        (1, base + timedelta(hours=5), 0, 0, 1),
        (1, base + timedelta(hours=6), 0, 1, 0),
        (2, base + timedelta(hours=4), 1, 1, 0),  # trigger+boundary same row
        (2, base + timedelta(hours=8), 1, 0, 0),  # never closed
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(in_dir / "b2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    q = (
        open_window_tracker(stream, "adm", "dis")
        .writeStream.format("memory")
        .queryName("tracker")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.subject_id, r.trigger_ts, r.boundary_ts, r.adm, r.dis, r.lab)
        for r in spark.sql("SELECT * FROM tracker").collect()
    )

    batch = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(str(in_dir))
    kernel = boolean_expr_bound_sum(batch, F.col("dis") > 0, "row_to_bound", "right")
    want = sorted(
        (r.subject_id, r.timestamp_at_start, r.timestamp_at_end, r.adm, r.dis, r.lab)
        for r in kernel.join(
            batch.filter(F.col("adm") > 0).select("subject_id", "timestamp"),
            ["subject_id", "timestamp"],
        )
        .filter(F.col("timestamp_at_end").isNotNull())
        .collect()
    )
    assert got == want
    # cross-batch window actually happened: subject 1's admission (file 1)
    # closed by the discharge in file 2 with both labs counted
    assert (1, base, base + timedelta(hours=6), 0, 1, 2) in got
    # same-row trigger+boundary closes itself with zero counts
    assert (2, base + timedelta(hours=4), base + timedelta(hours=4), 0, 0, 0) in got


def test_enrich_stream_batch_parity(spark, tmp_path):
    """Stream-static enrichment produces identical rows under read and
    readStream (availableNow drain)."""
    from aces_spark.streaming.pipeline import enrich_stream

    src = str(tmp_path / "ev")
    events = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "a", 40.0)],
        "subject_id long, code string, v double",
    )
    events.repartition(2).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (4, "gold")], "subject_id long, tier string"
    )

    batch = enrich_stream(spark.read.parquet(src), dim).select(
        "subject_id", "code", "tier"
    )
    want = sorted(map(tuple, batch.collect()))

    stream = enrich_stream(
        spark.readStream.schema(events.schema).parquet(src), dim
    ).select("subject_id", "code", "tier")
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == want
    # no-match stream rows keep null tier (left join semantics)
    assert (3, "c", None) in got


def test_apply_cdc_stream_merges_batches(spark, tmp_path):
    """A change stream applied via foreachBatch produces the same history
    as one batch scd2_merge over all changes."""
    import datetime as _dt

    from aces_spark.datapipe.cdc import scd2_merge
    from aces_spark.streaming.pipeline import apply_cdc_stream

    def ts(s):
        return _dt.datetime.fromisoformat(s)

    hist_path = str(tmp_path / "history")
    spark.createDataFrame(
        [(1, "a", ts("2024-01-01"), None), (2, "b", ts("2024-01-01"), None)],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    ).write.parquet(hist_path)

    changes = [
        (1, "a2", ts("2024-02-01")),
        (3, "c", ts("2024-02-15")),
        (1, "a3", ts("2024-03-01")),
    ]
    chg_schema = "id long, name string, effective_from timestamp"
    chg_dir = str(tmp_path / "changes")
    spark.createDataFrame(changes, chg_schema).write.parquet(chg_dir)

    stream = spark.readStream.schema(chg_schema).parquet(chg_dir)
    q = apply_cdc_stream(
        stream, hist_path, "id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    got = sorted(
        (r["id"], r["name"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(hist_path).collect()
    )
    original = spark.createDataFrame(
        [(1, "a", ts("2024-01-01"), None), (2, "b", ts("2024-01-01"), None)],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    )
    want = sorted(
        (r["id"], r["name"], r["valid_from"], r["valid_to"])
        for r in scd2_merge(
            original, spark.createDataFrame(changes, chg_schema), "id"
        ).collect()
    )
    assert got == want
    # the stream actually chained: a -> a2 -> a3 and the insert landed
    names = {n for _, n, _, _ in got}
    assert {"a", "a2", "a3", "c"} <= names


def test_maintain_stats_stream_equals_batch_aggregate(spark, tmp_path):
    """Streaming partial-state maintenance over micro-batches equals one
    batch aggregate over the union — the monoid invariant, streamed."""
    from aces_spark.datapipe.incremental import finalize_stats, partial_stats
    from aces_spark.streaming.pipeline import maintain_stats_stream

    schema = "k string, v double"
    rows = [("a", 1.5), ("b", 2.0), ("a", -0.5), ("c", 7.25), ("b", None)]
    src_dir = str(tmp_path / "vals")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    for i, r in enumerate(rows):
        spark.createDataFrame([r], schema).write.mode("overwrite").parquet(
            f"{src_dir}/f{i}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
    )
    state_path = str(tmp_path / "state")
    q = maintain_stats_stream(
        stream, state_path, ["k"], "v",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, finalize_stats(spark.read.parquet(state_path)).collect())
    )
    want = sorted(
        map(
            tuple,
            finalize_stats(
                partial_stats(spark.createDataFrame(rows, schema), ["k"], "v")
            ).collect(),
        )
    )
    assert got == want


def test_apply_cdc_stream_bootstraps_absent_history(spark, tmp_path):
    """First batch against a non-existent history path must create it
    (every change is an insert), not crash on the read."""
    import datetime as _dt

    from aces_spark.streaming.pipeline import apply_cdc_stream

    def ts(s):
        return _dt.datetime.fromisoformat(s)

    chg_schema = "id long, name string, effective_from timestamp"
    chg_dir = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "a", ts("2024-01-01")), (1, "a2", ts("2024-02-01")), (2, "b", ts("2024-01-15"))],
        chg_schema,
    ).write.parquet(chg_dir)

    hist_path = str(tmp_path / "history")  # never written
    stream = spark.readStream.schema(chg_schema).parquet(chg_dir)
    q = apply_cdc_stream(
        stream, hist_path, "id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    got = sorted(
        (r["id"], r["name"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(hist_path).collect()
    )
    assert got == [
        (1, "a", ts("2024-01-01"), ts("2024-02-01")),
        (1, "a2", ts("2024-02-01"), None),
        (2, "b", ts("2024-01-15"), None),
    ]


def test_promotion_recovery_after_partial_swap(spark, tmp_path):
    """Crash window simulation: destination deleted, complete new table
    left at __next — recovery completes the rename; and a CORRUPT state
    read fails loudly instead of silently restarting from one batch."""
    import shutil

    import pytest

    from aces_spark.streaming.pipeline import (
        _recover_promotion,
        _table_exists,
        maintain_stats_stream,
    )

    state = str(tmp_path / "state")
    spark.createDataFrame([("a", 1)], "k string, n long").write.parquet(state + "__next")
    assert not _table_exists(spark, state)
    _recover_promotion(spark, state)
    assert _table_exists(spark, state)
    assert not _table_exists(spark, state + "__next")
    assert spark.read.parquet(state).collect()[0]["k"] == "a"

    # corrupt (non-parquet) state: batch must raise, not treat as first batch
    bad_state = tmp_path / "bad_state"
    bad_state.mkdir()
    (bad_state / "part-00000.parquet").write_bytes(b"this is not parquet")
    src_dir = str(tmp_path / "vals")
    spark.createDataFrame([("a", 1.0)], "k string, v double").write.parquet(src_dir)
    stream = spark.readStream.schema("k string, v double").parquet(src_dir)
    q = maintain_stats_stream(
        stream, str(bad_state), ["k"], "v",
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger_available_now=True,
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
    # the corrupt state dir was NOT replaced by the batch's partials
    names = [p.name for p in bad_state.iterdir()]
    assert "part-00000.parquet" in names
    shutil.rmtree(str(bad_state), ignore_errors=True)


@pytest.mark.parametrize("mode", ["row_to_bound", "bound_to_row"])
@pytest.mark.parametrize("closed", ["right", "left", "both", "none"])
def test_open_window_tracker_full_grid_matches_batch_kernel(
    spark, tmp_path, mode, closed
):
    """r9 (VERDICT r8 ask #5): stream ≡ batch for EVERY mode×closedness,
    across micro-batch boundaries (maxFilesPerTrigger=1), including
    same-row trigger+boundary events and carried state."""
    from pyspark.sql import functions as F

    from aces_spark.operators.aggregate import boolean_expr_bound_sum
    from aces_spark.streaming.pipeline import open_window_tracker

    base = datetime(2024, 3, 1)
    schema = "subject_id long, timestamp timestamp, adm long, dis long, lab long"
    # three files → three micro-batches; subjects exercise: windows
    # spanning batches, trigger+boundary same row, multiple open windows,
    # boundary-before-trigger (backward carry), never-resolved triggers
    f1 = [
        (1, base + timedelta(hours=0), 1, 0, 0),
        (1, base + timedelta(hours=2), 0, 0, 1),
        (2, base + timedelta(hours=1), 1, 0, 1),
        (2, base + timedelta(hours=3), 0, 1, 1),
        (3, base + timedelta(hours=1), 0, 1, 1),  # boundary first (backward)
    ]
    f2 = [
        (1, base + timedelta(hours=5), 1, 0, 1),  # second open window
        (1, base + timedelta(hours=6), 0, 1, 1),
        (2, base + timedelta(hours=4), 1, 1, 1),  # trigger+boundary same row
        (3, base + timedelta(hours=7), 1, 0, 1),  # trigger after carried bnd
    ]
    f3 = [
        (1, base + timedelta(hours=8), 0, 1, 1),
        (2, base + timedelta(hours=9), 1, 0, 0),  # never closed (forward)
        (3, base + timedelta(hours=10), 0, 1, 0),
        (3, base + timedelta(hours=11), 1, 0, 1),
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((f1, f2, f3)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(in_dir / f"b{i}.parquet")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    qname = f"tracker_{mode}_{closed}"
    q = (
        open_window_tracker(stream, "adm", "dis", mode=mode, closed=closed)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.subject_id, r.trigger_ts, r.boundary_ts, r.adm, r.dis, r.lab)
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    )

    batch = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    kernel = boolean_expr_bound_sum(batch, F.col("dis") > 0, mode, closed)
    trig_rows = batch.filter(F.col("adm") > 0).select("subject_id", "timestamp")
    joined = kernel.join(trig_rows, ["subject_id", "timestamp"])
    if mode == "row_to_bound":
        resolved = joined.filter(F.col("timestamp_at_end").isNotNull())
        want = sorted(
            (r.subject_id, r.timestamp_at_start, r.timestamp_at_end,
             r.adm, r.dis, r.lab)
            for r in resolved.collect()
        )
    else:
        resolved = joined.filter(F.col("timestamp_at_start").isNotNull())
        # tracker output: (trigger_ts, boundary_ts) = (row ts, start ts)
        want = sorted(
            (r.subject_id, r.timestamp_at_end, r.timestamp_at_start,
             r.adm, r.dis, r.lab)
            for r in resolved.collect()
        )
    assert got == want, f"{mode}/{closed}: {got} != {want}"


def test_correlate_streams_inner_matches_batch(spark, tmp_path):
    """Stream-stream watermarked interval join (r9): inner-join parity
    with the identical batch join, across micro-batch splits — matches
    where the click arrives in a LATER micro-batch than its impression
    exercise both-side state."""
    from aces_spark.streaming.pipeline import correlate_streams

    base = datetime(2024, 5, 1)
    imp_schema = "user_id long, timestamp timestamp, ad string"
    clk_schema = "user_id long, timestamp timestamp, target string"
    imps = [
        [(1, base + timedelta(minutes=0), "a1"),
         (2, base + timedelta(minutes=1), "a2")],
        [(1, base + timedelta(minutes=30), "a3"),
         (3, base + timedelta(minutes=31), "a4")],
    ]
    clks = [
        [(1, base + timedelta(minutes=5), "t1")],     # matches a1 (same batch pair)
        [(2, base + timedelta(minutes=7), "t2"),      # matches a2 across batches
         (1, base + timedelta(minutes=33), "t3"),     # matches a3
         (1, base + timedelta(minutes=50), "t4"),     # outside a3's 10-min window
         (3, base + timedelta(minutes=31), "t5")],    # boundary: delay 0 matches
    ]
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    for i, rows in enumerate(imps):
        spark.createDataFrame(rows, imp_schema).coalesce(1).write.parquet(
            str(imp_dir / f"b{i}.parquet"))
    for i, rows in enumerate(clks):
        spark.createDataFrame(rows, clk_schema).coalesce(1).write.parquet(
            str(clk_dir / f"b{i}.parquet"))

    def rd(d, schema):
        return (spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true").parquet(str(d)))

    q = (
        correlate_streams(rd(imp_dir, imp_schema), rd(clk_dir, clk_schema),
                          ["user_id"], max_delay="10 minutes")
        .writeStream.format("memory").queryName("sscorr")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM sscorr").collect())

    bl = spark.read.schema(imp_schema).option("recursiveFileLookup", "true").parquet(str(imp_dir))
    br = spark.read.schema(clk_schema).option("recursiveFileLookup", "true").parquet(str(clk_dir))
    want = sorted(
        tuple(r)
        for r in correlate_streams(bl, br, ["user_id"], max_delay="10 minutes").collect()
    )
    assert got == want
    assert len(got) == 4  # a1-t1, a2-t2, a3-t3, a4-t5; t4 outside window


def test_correlate_streams_left_outer_emits_unmatched(spark, tmp_path):
    from aces_spark.streaming.pipeline import correlate_streams

    base = datetime(2024, 5, 1)
    imp_schema = "user_id long, timestamp timestamp, ad string"
    clk_schema = "user_id long, timestamp timestamp, target string"
    # key 9 never clicks; the far-future flush rows push both watermarks
    # past every real row so availableNow can emit the outer nulls
    flush = base + timedelta(days=30)
    imps = [(1, base, "a1"), (9, base + timedelta(minutes=1), "a9"),
            (999, flush, "fl")]
    clks = [(1, base + timedelta(minutes=2), "t1"), (999, flush, "fr")]
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    spark.createDataFrame(imps, imp_schema).coalesce(1).write.parquet(str(imp_dir / "b.parquet"))
    spark.createDataFrame(clks, clk_schema).coalesce(1).write.parquet(str(clk_dir / "b.parquet"))

    def rd(d, schema):
        return (spark.readStream.schema(schema)
                .option("recursiveFileLookup", "true").parquet(str(d)))

    q = (
        correlate_streams(rd(imp_dir, imp_schema), rd(clk_dir, clk_schema),
                          ["user_id"], max_delay="10 minutes",
                          watermark="5 minutes", how="leftOuter")
        .writeStream.format("memory").queryName("ssouter")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {(r["user_id"], r["l_ad"]): r["r_target"]
            for r in spark.sql("SELECT * FROM ssouter WHERE user_id < 999").collect()}
    assert rows == {(1, "a1"): "t1", (9, "a9"): None}


def test_correlate_streams_validation(spark):
    from aces_spark.streaming.pipeline import correlate_streams

    df = spark.createDataFrame(
        [(1, datetime(2024, 5, 1), "x")], "user_id long, timestamp timestamp, v string"
    )
    with pytest.raises(ValueError):
        correlate_streams(df, df, ["user_id"], how="fullOuter")
