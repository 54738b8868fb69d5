"""End-to-end golden test.

Fixture and expected output are transcribed from the reference's e2e test
(``tests/test_e2e.py:19-191``): the 24h in-hospital-mortality task over a
3-subject direct-mode predicates CSV, exercising demographics filtering,
derived predicates, ``_ANY_EVENT``, temporal + event-bound windows, node
splicing, label, and index_timestamp.
"""

from __future__ import annotations

import textwrap
from datetime import datetime

import pytest

from aces_spark import TaskExtractorConfig, get_predicates_df, query

PREDICATES_CSV = """\
subject_id,timestamp,male,female,admission,death,discharge,lab,spo2,normal_spo2,abnormally_low_spo2,abnormally_high_spo2,procedure_start,procedure_end,ventilation,diagnosis_ICD9CM_41071,diagnosis_ICD10CM_I214
1,,1,0,0,0,0,0,0,0,0,0,0,0,0,0,0
1,12/1/1989 12:03,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
1,12/1/1989 13:14,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,12/1/1989 15:17,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,12/1/1989 16:17,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,12/1/1989 20:17,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,12/2/1989 3:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,12/2/1989 9:00,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0
1,12/2/1989 10:00,0,0,0,0,0,0,0,0,0,0,1,0,1,0,0
1,12/2/1989 14:22,0,0,0,0,0,0,0,0,0,0,0,1,1,0,0
1,12/2/1989 15:00,0,0,0,0,1,0,0,0,0,0,0,0,0,0,0
1,1/21/1991 11:59,0,0,0,0,0,0,0,0,0,0,0,0,0,1,0
1,1/27/1991 23:32,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
1,1/27/1991 23:46,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,1/28/1991 3:18,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0
1,1/28/1991 3:28,0,0,0,0,0,0,0,0,0,0,1,0,1,0,0
1,1/28/1991 4:36,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,1/29/1991 23:32,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,1/30/1991 5:00,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0
1,1/30/1991 8:00,0,0,0,0,0,1,1,0,0,1,0,0,0,0,0
1,1/30/1991 11:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,1/30/1991 14:00,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0
1,1/30/1991 14:15,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0
1,1/31/1991 1:00,0,0,0,0,0,0,0,0,0,0,0,1,1,0,0
1,1/31/1991 2:15,0,0,0,0,1,0,0,0,0,0,0,0,0,0,0
1,2/8/1991 8:15,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
1,3/3/1991 19:33,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
1,3/3/1991 20:33,0,0,0,0,0,1,1,0,1,0,0,0,0,0,0
1,3/3/1991 21:38,0,0,0,1,0,0,0,0,0,0,0,0,0,0,0
2,,0,1,0,0,0,0,0,0,0,0,0,0,0,0,0
2,3/8/1996 2:24,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
2,3/8/1996 2:35,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
2,3/8/1996 4:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
2,3/8/1996 10:00,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0
2,3/8/1996 16:00,0,0,0,0,1,0,0,0,0,0,0,0,0,0,0
2,6/5/1996 0:32,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
2,6/5/1996 0:48,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1
2,6/5/1996 1:59,0,0,0,0,0,0,0,0,0,0,1,0,1,0,0
2,6/7/1996 6:00,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0
2,6/7/1996 9:00,0,0,0,0,0,1,1,0,1,0,0,0,0,0,0
2,6/7/1996 12:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
2,6/7/1996 15:00,0,0,0,0,0,0,0,0,0,0,0,1,1,0,0
2,6/7/1996 15:00,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0
2,6/8/1996 3:00,0,0,0,1,0,0,0,0,0,0,0,0,0,0,0
3,,1,0,0,0,0,0,0,0,0,0,0,0,0,0,0
3,3/8/1996 2:22,0,0,0,0,0,0,0,0,0,0,1,0,1,0,0
3,3/8/1996 2:24,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0
3,3/8/1996 2:37,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
3,3/9/1996 8:00,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0
3,3/9/1996 11:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
3,3/9/1996 19:00,0,0,0,0,0,1,1,1,0,0,0,0,0,0,0
3,3/9/1996 22:00,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0
3,3/11/1996 21:00,0,0,0,0,0,0,0,0,0,0,0,1,1,0,0
3,3/12/1996 0:00,0,0,0,1,0,0,0,0,0,0,0,0,0,0,0
"""

TASK_CFG = """\
predicates:
  admission:
    code: event_type//ADMISSION
  discharge:
    code: event_type//DISCHARGE
  death:
    code: event_type//DEATH
  discharge_or_death:
    expr: or(discharge, death)

patient_demographics:
  male:
    code: SEX//male

trigger: admission

windows:
  input:
    start: NULL
    end: trigger + 24h
    start_inclusive: True
    end_inclusive: True
    has:
      _ANY_EVENT: (5, None)
    index_timestamp: end
  gap:
    start: trigger
    end: start + 48h
    start_inclusive: False
    end_inclusive: True
    has:
      admission: (None, 0)
      discharge: (None, 0)
      death: (None, 0)
  target:
    start: gap.end
    end: start -> discharge_or_death
    start_inclusive: False
    end_inclusive: True
    label: death
"""

PRED_FIELDS = ["admission", "discharge", "death", "discharge_or_death", "_ANY_EVENT"]

EXPECTED = {
    "subject_id": 1,
    "index_timestamp": datetime(1991, 1, 28, 23, 32),
    "label": 0,
    "trigger": datetime(1991, 1, 27, 23, 32),
    "input.end_summary": (
        "input.end", datetime(1991, 1, 27, 23, 32), datetime(1991, 1, 28, 23, 32), 0, 0, 0, 0, 4,
    ),
    "input.start_summary": (
        "input.start", datetime(1989, 12, 1, 12, 3), datetime(1991, 1, 28, 23, 32), 2, 1, 0, 1, 16,
    ),
    "gap.end_summary": (
        "gap.end", datetime(1991, 1, 27, 23, 32), datetime(1991, 1, 29, 23, 32), 0, 0, 0, 0, 5,
    ),
    "target.end_summary": (
        "target.end", datetime(1991, 1, 29, 23, 32), datetime(1991, 1, 31, 2, 15), 0, 1, 0, 1, 7,
    ),
}


@pytest.fixture(scope="module")
def task_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "task.yaml"
    p.write_text(textwrap.dedent(TASK_CFG))
    return TaskExtractorConfig.load(p)


def test_window_tree_shape(task_cfg):
    from aces_spark import preorder_iter

    names = [n.name for n in preorder_iter(task_cfg.window_tree)]
    assert names == ["trigger", "input.end", "input.start", "gap.end", "target.end"]
    assert task_cfg.label_window == "target"
    assert task_cfg.index_timestamp_window == "input"


def test_e2e_inhospital_mortality(spark, task_cfg, tmp_path):
    csv_path = tmp_path / "sample_data.csv"
    csv_path.write_text(PREDICATES_CSV)

    predicates_df = get_predicates_df(
        task_cfg, spark, csv_path, standard="direct", ts_format="%m/%d/%Y %H:%M"
    )
    result = query(task_cfg, predicates_df)

    assert result.columns == [
        "subject_id",
        "index_timestamp",
        "label",
        "trigger",
        "input.end_summary",
        "input.start_summary",
        "gap.end_summary",
        "target.end_summary",
    ]

    rows = result.collect()
    assert len(rows) == 1, f"expected exactly 1 cohort row, got {len(rows)}: {rows}"
    row = rows[0].asDict()

    assert row["subject_id"] == EXPECTED["subject_id"]
    assert row["index_timestamp"] == EXPECTED["index_timestamp"]
    assert row["label"] == EXPECTED["label"]
    assert row["trigger"] == EXPECTED["trigger"]

    for col in ("input.end_summary", "input.start_summary", "gap.end_summary", "target.end_summary"):
        s = row[col]
        exp = EXPECTED[col]
        assert s["window_name"] == exp[0], f"{col}: {s}"
        assert s["timestamp_at_start"] == exp[1], f"{col}: {s}"
        assert s["timestamp_at_end"] == exp[2], f"{col}: {s}"
        for i, pred in enumerate(PRED_FIELDS):
            assert s[pred] == exp[3 + i], f"{col}.{pred}: expected {exp[3 + i]}, got {s[pred]}"


def test_e2e_idempotent(spark, task_cfg, tmp_path):
    """Repeated query() calls over the same config must agree — guards
    offset-accumulation mutation (reference
    ``tests/test_extract_subtree_idempotency.py``)."""
    csv_path = tmp_path / "sample_data.csv"
    csv_path.write_text(PREDICATES_CSV)
    predicates_df = get_predicates_df(
        task_cfg, spark, csv_path, standard="direct", ts_format="%m/%d/%Y %H:%M"
    )
    r1 = query(task_cfg, predicates_df).collect()
    r2 = query(task_cfg, predicates_df).collect()
    assert r1 == r2
