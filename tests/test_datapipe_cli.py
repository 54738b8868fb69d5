"""End-to-end tests for the datapipe CLI (in-process main(), shared
session)."""

from __future__ import annotations

import json

import pytest

from aces_spark.datapipe.cli import main


@pytest.fixture()
def docs_path(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 30, "en", "web"),
            (2, "the quick brown fox jumps over the lazy dog " * 30, "en", "web"),
            (3, "der schnelle braune fuchs springt ueber den hund " * 30, "de", "web"),
            (4, "completely different text about spark pipelines " * 30, "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(src)
    return src


def test_cli_dedup(spark, docs_path, tmp_path):
    out = str(tmp_path / "deduped")
    assert main(["dedup", "--input", docs_path, "--output", out]) == 0
    ids = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 3, 4]  # doc 2 is an exact dup of 1


def test_cli_split_fractions_checked(docs_path, tmp_path):
    with pytest.raises(SystemExit):
        main([
            "split", "--input", docs_path, "--output", str(tmp_path / "s"),
            "--train", "0.5", "--val", "0.1", "--test", "0.1",
        ])


def test_cli_chunk(spark, docs_path, tmp_path):
    out = str(tmp_path / "chunks")
    assert main([
        "chunk", "--input", docs_path, "--output", out,
        "--tokens", "64", "--stride", "48",
    ]) == 0
    df = spark.read.parquet(out)
    assert df.count() > 4
    assert "chunk_text" in df.columns


def test_cli_validate_exit_codes(docs_path, capsys):
    rc = main(["validate", "--input", docs_path, "--rules", "not_null:text,unique:doc_id"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report["rules"]["unique(doc_id)"]["n_violations"] == 0

    rc = main(["validate", "--input", docs_path, "--rules", "unique:text"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1  # docs 1 and 2 share text
    assert report["rules"]["unique(text)"]["n_violations"] == 2


def test_cli_diff(spark, docs_path, tmp_path, capsys):
    new = str(tmp_path / "new")
    spark.read.parquet(docs_path).filter("doc_id != 3").write.parquet(new)
    rc = main(["diff", "--old", docs_path, "--new", new, "--key", "doc_id"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report["statuses"]["removed"]["n_keys"] == 1
    assert report["statuses"]["unchanged"]["n_keys"] == 3


def test_cli_mix(spark, docs_path, tmp_path):
    out = str(tmp_path / "mixed")
    assert main([
        "mix", "--input", docs_path, "--output", out,
        "--weights", "en=0.5,de=0.5", "--strata-col", "lang",
    ]) == 0
    langs = {r["lang"] for r in spark.read.parquet(out).collect()}
    assert "de" in langs  # the scarce stratum binds and is fully kept


def test_cli_clean(spark, docs_path, tmp_path):
    out = str(tmp_path / "cleaned")
    assert main([
        "clean", "--input", docs_path, "--output", out, "--min-quality", "0.3",
    ]) == 0
    df = spark.read.parquet(out)
    assert 0 < df.count() <= 4
    assert "text" in df.columns  # original columns survive the join-back


def test_cli_pack(spark, docs_path, tmp_path):
    out = str(tmp_path / "packed")
    assert main([
        "pack", "--input", docs_path, "--output", out, "--max-tokens", "256",
    ]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 4
    assert "pack_id" in df.columns
