"""Grouped histogram quantile sketch, sentence/readability stats, and
the leakage-safe (cluster-aware) split."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------- hist_*_by


class TestGroupedHistogram:
    def test_quantiles_within_one_bucket_of_truth(self, spark):
        from aces_spark.datapipe.sketches import hist_quantiles_by, hist_registers_by

        rows = [("a", float(v)) for v in range(1, 101)] + [
            ("b", float(v)) for v in range(1, 11)
        ]
        df = spark.createDataFrame(rows, "g string, x double")
        regs = hist_registers_by(df, "g", "x", lo=0.0, hi=100.0, buckets=100)
        got = {
            (r["g"], r["q"]): r["est_value"]
            for r in hist_quantiles_by(
                regs, "g", [0.5, 0.9], lo=0.0, hi=100.0, buckets=100
            ).collect()
        }
        # bucket width 1: estimate within one width of the exact quantile
        assert abs(got[("a", 0.5)] - 50) <= 1
        assert abs(got[("a", 0.9)] - 90) <= 1
        assert abs(got[("b", 0.5)] - 5) <= 1
        assert abs(got[("b", 0.9)] - 9) <= 1

    def test_merge_by_equals_sketch_of_union(self, spark):
        from aces_spark.datapipe.sketches import hist_merge_by, hist_registers_by

        a = spark.createDataFrame(
            [("g", float(v)) for v in range(50)], "g string, x double"
        )
        b = spark.createDataFrame(
            [("g", float(v)) for v in range(25, 99)], "g string, x double"
        )
        kw = dict(lo=0.0, hi=100.0, buckets=20)
        merged = {
            (r["g"], r["bucket"]): r["cnt"]
            for r in hist_merge_by(
                "g",
                hist_registers_by(a, "g", "x", **kw),
                hist_registers_by(b, "g", "x", **kw),
            ).collect()
        }
        whole = {
            (r["g"], r["bucket"]): r["cnt"]
            for r in hist_registers_by(a.unionByName(b), "g", "x", **kw).collect()
        }
        assert merged == whole

    def test_out_of_range_clamps_to_edges(self, spark):
        from aces_spark.datapipe.sketches import hist_registers_by

        df = spark.createDataFrame(
            [("g", -5.0), ("g", 500.0), ("g", 5.0)], "g string, x double"
        )
        got = {
            r["bucket"]: r["cnt"]
            for r in hist_registers_by(df, "g", "x", lo=0.0, hi=10.0, buckets=10).collect()
        }
        assert got == {0: 1, 9: 1, 5: 1}

    def test_validation(self, spark):
        from aces_spark.datapipe.sketches import hist_quantiles_by, hist_registers_by

        df = spark.createDataFrame([("g", 1.0)], "g string, x double")
        with pytest.raises(ValueError):
            hist_registers_by(df, "g", "x", lo=5.0, hi=5.0)
        regs = hist_registers_by(df, "g", "x", lo=0.0, hi=10.0)
        with pytest.raises(ValueError):
            hist_quantiles_by(regs, "g", [0.0], lo=0.0, hi=10.0)


# ---------------------------------------------------- sentence_stats


class TestSentenceStats:
    def test_hand_computed_example(self, spark):
        from aces_spark.datapipe.text import sentence_stats

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran! Did it?")], "doc_id long, text string"
        )
        r = sentence_stats(df).collect()[0]
        assert r["n_sentences"] == 3
        assert r["n_words"] == 8
        # vowel groups: e-a-a-e-o-a-i-i (The cat sat The dog ran Did it)
        assert r["n_syllables"] == 8
        assert r["words_per_sentence"] == pytest.approx(8 / 3, abs=1e-4)
        assert r["syllables_per_word"] == pytest.approx(1.0, abs=1e-9)
        wps = round(8 / 3, 4)
        assert r["reading_ease"] == pytest.approx(
            round(206.835 - 1.015 * wps - 84.6 * 1.0, 3), abs=1e-9
        )

    def test_empty_and_blank_text(self, spark):
        from aces_spark.datapipe.text import sentence_stats

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "...!!!")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in sentence_stats(df).collect()}
        for i in (1, 2, 3):
            assert got[i]["n_sentences"] == 0
            assert got[i]["words_per_sentence"] is None
            assert got[i]["reading_ease"] is None
        assert got[1]["n_words"] == 0 and got[2]["n_words"] == 0
        # punctuation-only text is ONE whitespace token — the established
        # token_count contract (mirrored by the token_counts oracle)
        assert got[3]["n_words"] == 1

    def test_no_vowels_gives_null_ease_not_crash(self, spark):
        from aces_spark.datapipe.text import sentence_stats

        df = spark.createDataFrame([(1, "hm. tsk tsk.")], "doc_id long, text string")
        r = sentence_stats(df).collect()[0]
        assert r["n_sentences"] == 2 and r["n_words"] == 3
        assert r["n_syllables"] == 0
        assert r["syllables_per_word"] == 0.0
        assert r["reading_ease"] is not None  # 0 syllables is a value, not null


# ------------------------------------------------ leakage_safe_splits


class TestLeakageSafeSplit:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(20)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6), (10, 11)], "doc_a long, doc_b long"
        )
        return docs, pairs

    def test_no_cluster_straddles_splits(self, spark):
        from aces_spark.datapipe.packing import leakage_safe_splits

        docs, pairs = self._fixture(spark)
        got = leakage_safe_splits(docs, pairs).collect()
        by_cluster = {}
        for r in got:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_cluster.values())
        # the chain 0-1-2 is one cluster of size 3
        sizes = {r["doc_id"]: r["cluster_size"] for r in got}
        assert sizes[0] == sizes[1] == sizes[2] == 3
        assert sizes[3] == 1

    def test_singletons_match_plain_assign_splits(self, spark):
        """A doc absent from pairs must land exactly where assign_splits
        would put it (cluster_id == doc_id)."""
        from aces_spark.datapipe.packing import assign_splits, leakage_safe_splits

        docs, pairs = self._fixture(spark)
        safe = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_splits(docs, pairs).collect()
            if r["cluster_size"] == 1
        }
        plain = {
            r["doc_id"]: r["split"] for r in assign_splits(docs).collect()
        }
        assert safe == {d: plain[d] for d in safe}

    def test_custom_fractions_propagate(self, spark):
        from aces_spark.datapipe.packing import leakage_safe_splits

        docs, pairs = self._fixture(spark)
        got = leakage_safe_splits(docs, pairs, splits={"train": 0.5, "test": 0.5})
        assert set(r["split"] for r in got.collect()) <= {"train", "test"}


# ------------------------------------------------------ ngram_novelty


class TestNgramNovelty:
    def test_duplicate_owns_nothing(self, spark):
        from aces_spark.datapipe.dedup import ngram_novelty

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),          # 2 distinct 5-grams, both novel
                (2, "a b c d e f"),          # exact copy: owns none
                (3, "x y z"),                # < 5 tokens: absent
                (4, "a b c d e zzz"),        # 1 of 2 shingles shared with doc1
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in ngram_novelty(docs, n=5).collect()}
        assert 3 not in got
        assert (got[1]["n_shingles"], got[1]["n_novel"]) == (2, 2)
        assert got[1]["novelty_bp"] == 10000
        assert (got[2]["n_shingles"], got[2]["n_novel"]) == (2, 0)
        assert got[2]["novelty_bp"] == 0
        # doc4: "a b c d e" owned by doc1; "b c d e zzz" novel
        assert (got[4]["n_shingles"], got[4]["n_novel"]) == (2, 1)
        assert got[4]["novelty_bp"] == 5000

    def test_bp_rounds_half_up(self, spark):
        from aces_spark.datapipe.dedup import ngram_novelty

        # doc 2 shares 1 of its 3 shingles with doc 1 -> 2/3 = 6666.67 bp
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e f g")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["novelty_bp"] for r in ngram_novelty(docs, n=5).collect()}
        assert got[2] == 6667


# ------------------------------------------------- tokenizer_fertility


class TestTokenizerFertility:
    def test_hand_computed(self, spark):
        from aces_spark.datapipe.text import tokenizer_fertility

        docs = spark.createDataFrame(
            [
                (1, "en", "hello, world!"),   # ws 2; bpe: hello , world ! = 4
                (2, "en", "one two"),          # ws 2; bpe 2
                (3, "de", ""),                 # ws 0; bpe 0
            ],
            "doc_id long, lang string, text string",
        )
        got = {r["group"]: r for r in tokenizer_fertility(docs).collect()}
        en = got["en"]
        assert (en["n_docs"], en["ws_tokens"], en["bpe_tokens"]) == (2, 4, 6)
        assert en["fertility"] == 1.5
        assert en["chars_per_token"] == round((13 + 7) / 6, 4)
        de = got["de"]
        assert de["ws_tokens"] == 0 and de["fertility"] is None
        assert de["chars_per_token"] is None
