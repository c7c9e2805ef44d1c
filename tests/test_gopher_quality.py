"""Gopher-style quality gates and repetition signals (functions/text.py):
hand-computed expectations on crafted documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.text import (
    adjacent_duplicate_fraction,
    alpha_word_ratio,
    gopher_flags,
    mean_word_length,
    repeated_bigram_fraction,
    type_token_ratio,
)


def _eval(spark, text: str, col_fn) -> float:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).first()["v"]


class TestRepetitionSignals:
    def test_adjacent_duplicates(self, spark):
        # positions 2,3 repeat of 4-1=3 transitions
        assert _eval(spark, "a a a b", adjacent_duplicate_fraction) == pytest.approx(2 / 3)
        assert _eval(spark, "a b c d", adjacent_duplicate_fraction) == 0.0
        assert _eval(spark, "solo", adjacent_duplicate_fraction) == 0.0

    def test_repeated_bigrams(self, spark):
        # bigrams: "a b","b a","a b","b a" -> 2 distinct of 4 -> 0.5
        assert _eval(spark, "a b a b a", repeated_bigram_fraction) == pytest.approx(0.5)
        assert _eval(spark, "w x y z", repeated_bigram_fraction) == 0.0

    def test_type_token_ratio(self, spark):
        assert _eval(spark, "a a b", type_token_ratio) == pytest.approx(2 / 3)
        assert _eval(spark, "all distinct words here", type_token_ratio) == 1.0

    def test_mean_word_length(self, spark):
        assert _eval(spark, "ab abcd", mean_word_length) == pytest.approx(3.0)

    def test_alpha_word_ratio(self, spark):
        assert _eval(spark, "ab 12 cd", alpha_word_ratio) == pytest.approx(2 / 3)


class TestGopherGates:
    def test_good_document_passes_all(self, spark):
        good = "the quick brown fox jumps over a lazy dog and then " * 4
        df = spark.createDataFrame([(good,)], "text string")
        flags = gopher_flags(F.col("text"))
        row = df.select(*[v.alias(k) for k, v in flags.items()]).first()
        assert all(row[k] for k in flags), row.asDict()

    def test_numeric_soup_fails_alpha_and_stopwords(self, spark):
        bad = " ".join(str(i) for i in range(40))
        df = spark.createDataFrame([(bad,)], "text string")
        flags = gopher_flags(F.col("text"))
        row = df.select(*[v.alias(k) for k, v in flags.items()]).first()
        assert not row["alpha_ok"] and not row["stopword_ok"]
        assert row["word_count_ok"]  # 40 words is inside the window

    def test_repetition_gate(self, spark):
        spam = "the of and to a " + "buy " * 40
        df = spark.createDataFrame([(spam,)], "text string")
        flags = gopher_flags(F.col("text"))
        row = df.select(*[v.alias(k) for k, v in flags.items()]).first()
        assert not row["repetition_ok"]
        assert row["stopword_ok"]
