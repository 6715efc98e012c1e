"""Hand-computed micro-table tests for the text-stat expressions
(reference test style: inline expected-value unit tests, SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from data_quality_spark.functions import textstats as ts


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).collect()[0]["v"]


def test_word_count(spark):
    assert _one(spark, "a b  c\nd", ts.word_count) == 4
    assert _one(spark, "   ", ts.word_count) == 0
    assert _one(spark, "", ts.word_count) == 0
    assert _one(spark, "one", ts.word_count) == 1


def test_char_count_code_points(spark):
    # code-point semantics (TextLengthStatistics.java:57): é and 中 are 1 each
    assert _one(spark, "héllo 中文", ts.char_count) == 8


def test_mean_word_length(spark):
    assert _one(spark, "ab cdef", ts.mean_word_length) == pytest.approx(3.0)
    assert _one(spark, "", ts.mean_word_length) is None


def test_symbol_ratio(spark):
    # "ab!!" → 2 symbols / 4 chars
    assert _one(spark, "ab!!", ts.symbol_ratio) == pytest.approx(0.5)
    assert _one(spark, "abcd", ts.symbol_ratio) == pytest.approx(0.0)
    # whitespace and digits are not symbols
    assert _one(spark, "a 1", ts.symbol_ratio) == pytest.approx(0.0)


def test_stopword_count(spark):
    assert _one(spark, "The cat and THE dog", ts.stopword_count) == 3  # the, and, the
    assert _one(spark, "cat dog", ts.stopword_count) == 0


def test_distinct_word_ratio(spark):
    assert _one(spark, "a b a b", ts.distinct_word_ratio) == pytest.approx(0.5)
    assert _one(spark, "a A", ts.distinct_word_ratio) == pytest.approx(0.5)  # case-folded


def test_word_ngrams(spark):
    got = _one(spark, "a b c d", lambda c: ts.word_ngrams(c, 2))
    assert got == ["a b", "b c", "c d"]
    assert _one(spark, "a", lambda c: ts.word_ngrams(c, 2)) == []


def test_duplicate_ngram_fraction(spark):
    # "x y x y x" → bigrams: [x y, y x, x y, y x] → 2 distinct / 4 → dup 0.5
    assert _one(spark, "x y x y x", lambda c: ts.duplicate_ngram_fraction(c, 2)) == pytest.approx(0.5)
    assert _one(spark, "a b c", lambda c: ts.duplicate_ngram_fraction(c, 2)) == pytest.approx(0.0)
    assert _one(spark, "a", lambda c: ts.duplicate_ngram_fraction(c, 2)) == pytest.approx(0.0)


def test_line_stats(spark):
    assert _one(spark, "ab\ncdef\ng", ts.line_count) == 3
    assert _one(spark, "ab\ncdef\ng", ts.max_line_length) == 4
    assert _one(spark, "- one\n- two\ntext", ts.bullet_line_fraction) == pytest.approx(2 / 3)
    assert _one(spark, "read more...\ndone", ts.ellipsis_line_fraction) == pytest.approx(0.5)


def test_alpha_word_fraction(spark):
    assert _one(spark, "abc 123 a1", ts.alpha_word_fraction) == pytest.approx(2 / 3)


def test_cjk_ratio(spark):
    assert _one(spark, "中文中文", ts.cjk_ratio) == pytest.approx(1.0)
    assert _one(spark, "ab中文", ts.cjk_ratio) == pytest.approx(0.5)
    assert _one(spark, "abcd", ts.cjk_ratio) == pytest.approx(0.0)


def test_word_pattern_expr(spark):
    from data_quality_spark.operators.profiling import word_pattern_expr

    got = _one(spark, "John SMITH bought 42 items, 中文 x9y", word_pattern_expr)
    assert got == "[Word] [WORD] [word] [Number] items, [Ideogram] [alnum]"
