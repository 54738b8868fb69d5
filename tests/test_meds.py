"""MEDS-mode golden test.

Ports the reference's sharded MEDS fixture (``tests/test_meds.py:161-360``):
5 shards (including an empty one and one yielding no cohort rows), regex
predicates, a static demographic filter, and the in-hospital-mortality task.
Where the reference runs one process per shard, the Spark engine reads the
whole shard directory as a single scan, so the expected output is the union
of the reference's per-shard label frames: subjects 1 and 4, prediction
time 1991-01-28 23:32, label False.
"""

from __future__ import annotations

import textwrap
from datetime import datetime

import pytest

from aces_spark import TaskExtractorConfig, get_predicates_df, query
from aces_spark.sources.sinks import to_meds_labels
from tests.conftest import ts

SHARDS = {
    "train_0": """\
subject_id,time,code,numeric_value
2,,SNP//rs234567,
2,,SNP//rs345678,
2,,GENDER//FEMALE,
2,3/8/1996 2:22,ED_VISIT,
2,3/8/1996 2:24,ADMISSION//SURGICAL,
2,3/8/1996 2:24,TEMP//F,98.6
2,3/8/1996 2:24,AOx3,
2,3/8/1996 2:35,LAB//HR,110
2,3/8/1996 2:35,LAB//HR,102
2,3/8/1996 4:00,diagnosis//unk,
2,3/8/1996 10:00,LAB//RBC,3.2
2,3/8/1996 16:00,DISCHARGE//HOME,
2,6/5/1996 0:32,ADMISSION//ED,
2,6/5/1996 0:48,LAB//HR,9999
2,6/5/1996 1:59,LAB//HR,102
2,6/7/1996 6:00,LAB//HR,89
2,6/7/1996 9:00,LAB//RR,25
2,6/7/1996 12:00,VENTILATION_START,
2,6/7/1996 12:00,LAB//SpO2,79.1
2,6/7/1996 15:00,LAB//RR,40
2,6/7/1996 15:00,LAB//HR,60
2,6/8/1996 3:00,DEATH,
""",
    "train_1": """\
subject_id,time,code,numeric_value
4,,GENDER//MALE,
4,,SNP//rs123456,
4,12/1/1989 12:03,ADMISSION//CARDIAC,
4,12/1/1989 12:03,diagnosis//ICD10CM//K79.8,
4,12/1/1989 13:14,LAB//SPO2,98.6
4,12/1/1989 15:17,LAB//SPO2,99.6
4,12/1/1989 16:17,LAB//SPO2,98.9
4,12/1/1989 20:17,LAB//SPO2,99.2
4,12/2/1989 3:00,LAB//SPO2,99.1
4,12/2/1989 9:00,LAB//HR,60
4,12/2/1989 10:00,diagnosis//ICD9CM//403.2,
4,12/2/1989 10:00,LAB//BUN,
4,12/2/1989 14:22,CXR,
4,12/2/1989 14:22,LAB//RR,40.2
4,12/2/1989 15:00,DISCHARGE//HOME,
4,1/21/1991 11:59,CLINIC_VISIT,
4,1/27/1991 23:32,ADMISSION//ORTHO,
4,1/27/1991 23:46,LAB//HR,60
4,1/28/1991 3:18,LAB//HR,60
4,1/28/1991 3:18,LAB//HR,62
4,1/28/1991 3:28,LAB//HR,68
4,1/28/1991 4:36,LAB//HR,70
4,1/28/1991 4:36,LAB//SpO2,99.2
4,1/29/1991 23:32,LAB//HR,60
4,1/30/1991 5:00,diagnosis//ICD9CM//403.2,
4,1/30/1991 8:00,LAB//HR,62
4,1/30/1991 11:00,LAB//HR,59
4,1/30/1991 14:00,LAB//HR,60
4,1/30/1991 14:15,LAB//HR,60
4,1/31/1991 1:00,LAB//HR,60
4,1/31/1991 2:15,DISCHARGE//SNF,
4,2/8/1991 8:15,OUTPATIENT_VISIT,
4,3/3/1991 19:33,ADMISSION//ED,
4,3/3/1991 20:33,LAB//HR,42
4,3/3/1991 21:38,DEATH,
6,,GENDER//MALE,
6,,SNP//rs234567,
6,,SNP//rs345678,
6,3/8/1996 2:22,ED_VISIT,
6,3/8/1996 2:24,ADMISSION//MEDICAL,
6,3/8/1996 2:37,LAB//HR,60
6,3/9/1996 8:00,LAB//HR,60
6,3/9/1996 11:00,LAB//SpO2,99.2
6,3/9/1996 19:00,LAB//RR,43
6,3/9/1996 22:00,LAB//RR,40
6,3/11/1996 21:00,LAB//HR,60
6,3/12/1996 0:00,DEATH,
""",
    "held_out_0_0": """\
subject_id,time,code,numeric_value
3,,GENDER//FEMALE,
3,,SNP//rs234567,
3,,SNP//rs345678,
3,3/8/1996 2:22,ED_VISIT,
3,3/8/1996 2:24,ADMISSION//MEDICAL,
3,3/8/1996 2:37,LAB//HR,60
3,3/9/1996 8:00,LAB//HR,60
3,3/9/1996 11:00,LAB//SpO2,99.2
3,3/9/1996 19:00,LAB//RR,43
3,3/9/1996 22:00,LAB//RR,40
3,3/11/1996 21:00,LAB//HR,60
3,3/12/1996 0:00,DEATH,
""",
    "empty_shard": """\
subject_id,time,code,numeric_value
""",
    "held_out": """\
subject_id,time,code,numeric_value
1,,GENDER//MALE,
1,,SNP//rs123456,
1,12/1/1989 12:03,ADMISSION//CARDIAC,
1,12/1/1989 12:03,diagnosis//ICD10CM//K79.8,
1,12/1/1989 13:14,LAB//SPO2,98.6
1,12/1/1989 15:17,LAB//SPO2,99.6
1,12/1/1989 16:17,LAB//SPO2,98.9
1,12/1/1989 20:17,LAB//SPO2,99.2
1,12/2/1989 3:00,LAB//SPO2,99.1
1,12/2/1989 9:00,LAB//HR,60
1,12/2/1989 10:00,diagnosis//ICD9CM//403.2,
1,12/2/1989 10:00,LAB//BUN,
1,12/2/1989 14:22,CXR,
1,12/2/1989 14:22,LAB//RR,40.2
1,12/2/1989 15:00,DISCHARGE//HOME,
1,1/21/1991 11:59,CLINIC_VISIT,
1,1/27/1991 23:32,ADMISSION//ORTHO,
1,1/27/1991 23:46,LAB//HR,60
1,1/28/1991 3:18,LAB//HR,60
1,1/28/1991 3:18,LAB//HR,62
1,1/28/1991 3:28,LAB//HR,68
1,1/28/1991 4:36,LAB//HR,70
1,1/28/1991 4:36,LAB//SpO2,99.2
1,1/29/1991 23:32,LAB//HR,60
1,1/30/1991 5:00,diagnosis//ICD9CM//403.2,
1,1/30/1991 8:00,LAB//HR,62
1,1/30/1991 11:00,LAB//HR,59
1,1/30/1991 14:00,LAB//HR,60
1,1/30/1991 14:15,LAB//HR,60
1,1/31/1991 1:00,LAB//HR,60
1,1/31/1991 2:15,DISCHARGE//SNF,
1,2/8/1991 8:15,OUTPATIENT_VISIT,
1,3/3/1991 19:33,ADMISSION//ED,
1,3/3/1991 20:33,LAB//HR,42
1,3/3/1991 21:38,DEATH,
""",
}

TASK_CFG = """\
predicates:
  admission:
    code: {regex: ADMISSION.*}
  discharge:
    code: {regex: DISCHARGE.*}
  death:
    code: DEATH
  discharge_or_death:
    expr: or(discharge, death)

patient_demographics:
  male:
    code: GENDER//MALE

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
      discharge_or_death: (None, 0)
  target:
    start: gap.end
    end: start -> discharge_or_death
    start_inclusive: False
    end_inclusive: True
    label: death
"""


def _write_shards(spark, root) -> str:
    """Write each CSV shard as a parquet file under one directory, with the
    MEDS column types (``tests/test_meds.py:38-43`` in the reference)."""
    import pandas as pd

    schema = "subject_id long, time timestamp, code string, numeric_value float"
    for name, csv_text in SHARDS.items():
        lines = csv_text.strip().split("\n")
        rows = []
        for line in lines[1:]:
            sid, t, code, nv = line.split(",")
            rows.append((int(sid), ts_meds(t), code, float(nv) if nv else None))
        sdf = spark.createDataFrame(rows, schema)
        sdf.coalesce(1).write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


def ts_meds(t: str):
    if not t:
        return None
    return datetime.strptime(t, "%m/%d/%Y %H:%M")


@pytest.fixture(scope="module")
def meds_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("meds_shards")
    _write_shards(spark, root)
    return root


@pytest.fixture(scope="module")
def task_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "task.yaml"
    p.write_text(textwrap.dedent(TASK_CFG))
    return TaskExtractorConfig.load(p)


def test_meds_inhospital_mortality(spark, meds_dir, task_cfg):
    predicates_df = get_predicates_df(task_cfg, spark, meds_dir, standard="meds")
    result = query(task_cfg, predicates_df)
    labels = to_meds_labels(result)

    assert [f.name for f in labels.schema.fields] == [
        "subject_id", "prediction_time", "boolean_value", "integer_value", "float_value",
        "categorical_value",
    ]
    got = sorted(
        (r["subject_id"], r["prediction_time"], r["boolean_value"], r["integer_value"],
         r["float_value"], r["categorical_value"])
        for r in labels.collect()
    )
    want = [
        (1, ts("1991-01-28 23:32"), False, None, None, None),
        (4, ts("1991-01-28 23:32"), False, None, None, None),
    ]
    assert got == want, f"got {got}"


def test_meds_single_shard_empty_result(spark, meds_dir, task_cfg):
    """A shard whose subjects yield no cohort rows produces an empty frame
    with the full schema (reference ``tests/test_meds.py`` train/0)."""
    predicates_df = get_predicates_df(
        task_cfg, spark, f"{meds_dir}/train_0.parquet", standard="meds"
    )
    result = query(task_cfg, predicates_df)
    assert result.count() == 0
    assert "subject_id" in result.columns and "label" in result.columns
