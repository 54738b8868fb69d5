"""Round-10 operator tests — judge asks from VERDICT r9.

1. ``negative_samples`` auto-switches to the bucketized interval
   equi-join past ``max_broadcast_items`` with IDENTICAL output to the
   broadcast path (judge ask #4): parity pinned with the threshold
   forced below the vocabulary size.
"""

from __future__ import annotations

from aces_spark.datapipe.sampling import negative_samples


def _collect_sorted(df):
    return sorted(
        (r["user_id"], r["item"], r["neg_rank"], r["neg_item"]) for r in df.collect()
    )


def test_negative_samples_bucketized_parity(spark):
    # 40 items, Zipf-ish repetition so the cumulative intervals have
    # very unequal widths (the bucketized path must still route every
    # draw to exactly one containing interval)
    rows = []
    for u in range(60):
        for j in range((u % 7) + 1):
            rows.append((f"u{u}", f"item{(u * 13 + j * j) % 40}"))
    pos = spark.createDataFrame(rows, "user_id string, item string")

    broadcasted = negative_samples(pos, k=3)  # default threshold: broadcast
    bucketized = negative_samples(pos, k=3, max_broadcast_items=10)

    got_b = _collect_sorted(broadcasted)
    got_k = _collect_sorted(bucketized)
    assert len(got_b) == len(rows) * 3  # exactly one negative per draw
    assert got_b == got_k


def test_negative_samples_bucketized_parity_uniform(spark):
    pos = spark.createDataFrame(
        [(f"u{i}", f"it{i % 25}") for i in range(100)],
        "user_id string, item string",
    )
    a = _collect_sorted(negative_samples(pos, k=2, smoothing="uniform"))
    b = _collect_sorted(
        negative_samples(pos, k=2, smoothing="uniform", max_broadcast_items=5)
    )
    assert a == b and len(a) == 200
