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


def test_cli_sketch(docs_path, capsys):
    rc = main(["sketch", "--input", docs_path, "--col", "doc_id", "--method", "kmv"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert report["method"] == "kmv" and report["estimate"] == 4.0

    rc = main(["sketch", "--input", docs_path, "--col", "lang"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and report["method"] == "hll"
    assert report["estimate"] == pytest.approx(2, abs=1)


def test_cli_sample(spark, docs_path, tmp_path):
    out = str(tmp_path / "sampled")
    assert main([
        "sample", "--input", docs_path, "--output", out,
        "--weight-col", "doc_id", "--k", "2",
    ]) == 0
    assert spark.read.parquet(out).count() == 2


def test_cli_score_lm(spark, docs_path, tmp_path):
    out = str(tmp_path / "scored")
    assert main([
        "score-lm", "--input", docs_path, "--output", out,
        "--train", docs_path,
    ]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 4 and "nll" in df.columns


def test_cli_bm25(docs_path, capsys):
    rc = main(["bm25", "--input", docs_path, "--terms", "fox,spark", "--k", "3"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert len(report["hits"]) == 3
    assert {h["doc_id"] for h in report["hits"]} <= {1, 2, 3, 4}


def test_cli_merge_scd2(spark, docs_path, tmp_path, capsys):
    hist = str(tmp_path / "hist")
    chg = str(tmp_path / "chg")
    from conftest import ts as _ts

    spark.createDataFrame(
        [(1, "a", _ts("2024-01-01"), None)],
        "id long, name string, valid_from timestamp, valid_to timestamp",
    ).write.parquet(hist)
    spark.createDataFrame(
        [(1, "b", _ts("2024-02-01"))],
        "id long, name string, effective_from timestamp",
    ).write.parquet(chg)
    out = str(tmp_path / "merged")
    assert main([
        "merge-scd2", "--history", hist, "--input", chg,
        "--output", out, "--key", "id",
    ]) == 0
    rows = {r["name"]: (r["valid_from"], r["valid_to"]) for r in spark.read.parquet(out).collect()}
    assert rows["a"] == (_ts("2024-01-01"), _ts("2024-02-01"))
    assert rows["b"] == (_ts("2024-02-01"), None)


def test_cli_cms(spark, docs_path, capsys):
    assert main(["cms", "--input", docs_path, "--col", "lang"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "cms" and out["n_registers"] >= 2
    assert main([
        "cms", "--input", docs_path, "--col", "lang", "--probe", "en,de,xx",
    ]) == 0
    est = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["estimates"]
    got = {e["lang"]: e["est_count"] for e in est}
    assert got["en"] == 3 and got["de"] == 1 and got["xx"] == 0


def test_cli_zorder(spark, docs_path, tmp_path):
    out = str(tmp_path / "zordered")
    assert main([
        "zorder", "--input", docs_path, "--output", out,
        "--cols", "doc_id,doc_id", "--bits", "8", "--files", "2",
    ]) == 0
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 4,
    ]


def test_cli_pagerank(spark, tmp_path, capsys):
    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    ).write.mode("overwrite").parquet(edges)
    assert main(["pagerank", "--input", edges, "--k", "3"]) == 0
    top = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["top"]
    assert len(top) == 3
    assert top[0]["rank_u"] >= top[-1]["rank_u"]


def test_cli_decontam_report_and_filter(spark, docs_path, tmp_path):
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog " * 30)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(bench)

    out = str(tmp_path / "report")
    assert main([
        "decontam", "--input", docs_path, "--output", out,
        "--benchmark", bench,
    ]) == 0
    rep = {r["doc_id"]: r["frac"] for r in spark.read.parquet(out).collect()}
    assert rep[1] == 1.0 and rep[2] == 1.0  # exact benchmark copies
    assert rep[4] == 0.0

    clean = str(tmp_path / "clean")
    assert main([
        "decontam", "--input", docs_path, "--output", clean,
        "--benchmark", bench, "--max-frac", "0.5",
    ]) == 0
    ids = sorted(r["doc_id"] for r in spark.read.parquet(clean).collect())
    assert ids == [3, 4]


def test_cli_artifacts_report_and_filter(spark, tmp_path):
    src = str(tmp_path / "moji")
    spark.createDataFrame(
        [
            (1, "clean prose here"),
            (2, "damaged cafÃ© â€œtextâ€ " * 5),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    rep = str(tmp_path / "report")
    assert main(["artifacts", "--input", src, "--output", rep]) == 0
    got = {r["doc_id"]: r["is_damaged"] for r in spark.read.parquet(rep).collect()}
    assert got == {1: False, 2: True}

    filt = str(tmp_path / "filtered")
    assert main(
        ["artifacts", "--input", src, "--output", filt, "--max-bp", "0"]
    ) == 0
    assert [r["doc_id"] for r in spark.read.parquet(filt).collect()] == [1]


def test_cli_classify(spark, tmp_path):
    src = str(tmp_path / "cdocs")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(src)
    wts = str(tmp_path / "weights")
    spark.createDataFrame(
        [(b, 5) for b in range(16)], "bucket long, weight_micro long"
    ).write.mode("overwrite").parquet(wts)

    out = str(tmp_path / "scored")
    assert main(
        ["classify", "--input", src, "--output", out,
         "--weights", wts, "--buckets", "16", "--bias-micro", "100"]
    ) == 0
    got = {r["doc_id"]: r["score_micro"] for r in spark.read.parquet(out).collect()}
    # every bucket has weight 5: score = bias + 5 * sum of token signs
    import hashlib

    def sign(w):
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        return -1 if h & (1 << 59) else 1

    assert got[2] == 100  # empty doc scores exactly the bias
    assert got[1] == 100 + 5 * (sign("alpha") + sign("beta"))
