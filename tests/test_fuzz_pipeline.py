"""Full-pipeline fuzzing: random window trees × random frames, engine
(auto planner) vs the per-anchor brute-force oracle from
``test_sample_configs``.

Adds coverage the fixed sample tasks don't reach: event-bound INTERNAL
nodes (windows chained off a resolved boundary), mixed temporal/event
shapes at random depths, random constraints (incl. anti-constraints),
and random closedness — all validated against an implementation that
shares no code with either planner's window algebra.
"""

from __future__ import annotations

import random

import pytest

from aces_spark.config import (
    EventConfig,
    PlainPredicateConfig,
    TaskExtractorConfig,
    WindowConfig,
)
from aces_spark.query import query
from test_sample_configs import US_H, brute_query, engine_rows

PRED_NAMES = ["trig", "bnd", "x"]
PREDS = {p: PlainPredicateConfig(p.upper()) for p in PRED_NAMES}


def make_rows(seed: int, n_subj: int = 15):
    rng = random.Random(seed)
    rows = []
    for sid in range(1, n_subj + 1):
        hours = sorted(rng.sample(range(0, 24 * 60), rng.randint(2, 30)))
        for h in hours:
            code = rng.choice(["TRIG", "TRIG", "BND", "X", "X", "X", "OTHER"])
            rows.append((sid, h * US_H, code, None))
    return rows


def make_cfg(seed: int) -> TaskExtractorConfig:
    rng = random.Random(1000 + seed)
    windows = {}
    # refs the next window may hang off; event-bound ends create INTERNAL
    # event-bound nodes when referenced
    refs = ["trigger"]
    n_windows = rng.randint(1, 4)
    for i in range(n_windows):
        name = f"w{i}"
        ref = rng.choice(refs)
        shape = rng.choice(["t_fwd", "t_bwd", "e_fwd", "e_bwd"])
        si, ei = rng.random() < 0.5, rng.random() < 0.5
        has = {}
        if rng.random() < 0.5:
            pred = rng.choice(PRED_NAMES + ["_ANY_EVENT"])
            has[pred] = rng.choice(["(1, None)", "(None, 0)", "(1, 5)", "(2, None)"])
        kw = dict(start_inclusive=si, end_inclusive=ei, has=has)
        hours = rng.choice([6, 24, 48, 72])
        if shape == "t_fwd":
            windows[name] = WindowConfig(start=ref, end=f"start + {hours}h", **kw)
            refs.append(f"{name}.end")
        elif shape == "t_bwd":
            windows[name] = WindowConfig(start=f"end - {hours}h", end=ref, **kw)
            refs.append(f"{name}.start")
        elif shape == "e_fwd":
            windows[name] = WindowConfig(start=ref, end="start -> bnd", **kw)
            refs.append(f"{name}.end")  # children here = event-bound INTERNAL node
        else:
            windows[name] = WindowConfig(start="end <- bnd", end=ref, **kw)
            refs.append(f"{name}.start")
    # random label/index on a window whose far side is valid for each
    last = f"w{n_windows - 1}"
    if rng.random() < 0.7:
        windows[last].label = rng.choice(PRED_NAMES)
    if rng.random() < 0.5:
        windows["w0"].index_timestamp = "end" if windows["w0"].root_node == "start" else "start"
    return TaskExtractorConfig(predicates=dict(PREDS), trigger=EventConfig("trig"), windows=windows)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_engine_vs_brute_force(spark, seed):
    cfg = make_cfg(seed)
    rows = make_rows(seed)
    cols, node_names, want = brute_query(cfg, rows)

    import datetime

    df = spark.createDataFrame(
        [
            (sid, datetime.datetime.utcfromtimestamp(ts / 1_000_000), code, val)
            for sid, ts, code, val in rows
        ],
        "subject_id long, timestamp timestamp, code string, numeric_value float",
    )
    from aces_spark.sources.predicates import plain_predicates_from_meds_df

    pred_df = plain_predicates_from_meds_df(df, cfg.plain_predicates)
    got = engine_rows(cfg, query(cfg, _with_specials(cfg, pred_df)).collect(), cols, node_names)
    assert got == want, f"seed {seed}: engine != brute force"


def _with_specials(cfg, data):
    """Append special predicate columns exactly as get_predicates_df does
    (trimmed to what the fuzz configs can reference)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aces_spark.types import (
        ANY_EVENT_COLUMN,
        END_OF_RECORD_KEY,
        PRED_CNT_TYPE,
        START_OF_RECORD_KEY,
    )

    w_subj = W.partitionBy("subject_id")
    special = []
    for w in cfg.windows.values():
        if ANY_EVENT_COLUMN in w.referenced_predicates and ANY_EVENT_COLUMN not in special:
            special.append(ANY_EVENT_COLUMN)
        for key in (START_OF_RECORD_KEY, END_OF_RECORD_KEY):
            if key in w.constraint_predicates and key not in special:
                special.append(key)
    if ANY_EVENT_COLUMN in special:
        data = data.withColumn(
            ANY_EVENT_COLUMN, F.when(F.col("timestamp").isNotNull(), F.lit(1)).cast(PRED_CNT_TYPE)
        )
    if START_OF_RECORD_KEY in special:
        data = data.withColumn(
            START_OF_RECORD_KEY,
            (F.col("timestamp") == F.min("timestamp").over(w_subj)).cast(PRED_CNT_TYPE),
        )
    if END_OF_RECORD_KEY in special:
        data = data.withColumn(
            END_OF_RECORD_KEY,
            (F.col("timestamp") == F.max("timestamp").over(w_subj)).cast(PRED_CNT_TYPE),
        )
    return data
