"""Native column expressions for text statistics.

Reference semantics: TextLengthAnalyzer / TextLengthStatistics count
**code-point** lengths with and without blanks
(`dataquality-statistics/.../text/TextLengthAnalyzer.java:28,40-50`,
`TextLengthStatistics.java:51-109`).  Spark's `length()` on a string column
counts code points, so the reference semantics are the built-in ones.

On top of that we provide the Gopher/C4-family heuristic features used by the
web-text quality rules (SURVEY.md §7.2 step 2): word count, mean word length,
symbol-to-word ratio, stop-word fraction, repetition (distinct-word and
duplicate-n-gram fractions), line-shape features.  Every expression here is a
pure Catalyst expression — whole-stage-codegen friendly, no Python in the hot
path — and each has an exact ANSI/DuckDB SQL equivalent used by the
correctness oracle.

Determinism contract: every function is a pure per-row function of its input
column; results are invariant under repartitioning and parallelism level.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stop-word list — the analog of the reference's dictionary-membership rule
# (WordNetDictionary.isValidTerm, `dataquality-wordnet/.../WordNetDictionary.
# java:112`): membership of tokens in a broadcast set.  Union of the most
# frequent function words of en/de/fr/es so prose in any supported
# space-delimited language registers hits.  Frozen so oracle SQL can inline it.
STOPWORDS: tuple[str, ...] = (
    # en
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "it",
    "is", "was", "for", "on", "are", "with", "as", "at", "this", "but",
    # de
    "der", "die", "das", "und", "ist", "ein", "eine", "mit", "nicht", "auf",
    # fr
    "le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas",
    # es
    "el", "los", "las", "y", "es", "por", "para", "con", "del", "se",
)


def words(col: Column) -> Column:
    """Array of non-empty whitespace-separated tokens (code-point aware)."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != F.lit(""))


def word_count(col: Column) -> Column:
    """Number of whitespace-separated words."""
    return F.size(words(col))


def char_count(col: Column) -> Column:
    """Code-point length (reference: TextLengthStatistics code-point count)."""
    return F.length(col)


def mean_word_length(col: Column) -> Column:
    """Mean code-point length of words; null for empty texts."""
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total / F.size(w))


def symbol_ratio(col: Column) -> Column:
    """Fraction of code points that are neither letter, digit nor whitespace."""
    sym = F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", ""))
    return F.when(F.length(col) > 0, sym / F.length(col)).otherwise(F.lit(0.0))


def stopword_count(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of words whose lower-case form is in the stop-word set."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(col), lambda w: F.array_contains(stop_arr, F.lower(w))))


def stopword_fraction(col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    wc = word_count(col)
    return F.when(wc > 0, stopword_count(col, stopwords) / wc).otherwise(F.lit(0.0))


def distinct_word_ratio(col: Column) -> Column:
    """distinct words / words — low values indicate repetition spam."""
    w = F.transform(words(col), lambda x: F.lower(x))
    return F.when(F.size(w) > 0, F.size(F.array_distinct(w)) / F.size(w))


def ngrams_from_words(w: Column, n: int) -> Column:
    """Array of word n-grams (space-joined) from a word-array column.

    O(len) via shifted-slice `zip_with` (not O(len²) per-position slicing).
    Empty array when fewer than n words.  `w` should already be case-folded
    if case-insensitive n-grams are wanted.
    """
    cnt = F.size(w)
    grams = F.zip_with(
        F.slice(w, 1, cnt - (n - 1)),
        F.slice(w, 2, cnt - (n - 1)),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    for k in range(3, n + 1):
        grams = F.zip_with(
            grams,
            F.slice(w, k, cnt - (n - 1)),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int) -> Column:
    """Array of lower-cased word n-grams of a text column (native expr)."""
    w = F.transform(words(col), lambda x: F.lower(x))
    return ngrams_from_words(w, n)


def duplicate_ngram_fraction(col: Column, n: int) -> Column:
    """1 - distinct n-grams / n-grams; 0.0 when fewer than n words.

    The repetition-spam feature (Gopher 'duplicate n-gram fraction').
    """
    g = word_ngrams(col, n)
    return F.when(
        F.size(g) > 0, 1.0 - F.size(F.array_distinct(g)) / F.size(g)
    ).otherwise(F.lit(0.0))


def lines(col: Column) -> Column:
    return F.split(col, r"\n")


def line_count(col: Column) -> Column:
    return F.size(lines(col))


def max_line_length(col: Column) -> Column:
    return F.array_max(F.transform(lines(col), lambda l: F.length(l)))


def bullet_line_fraction(col: Column) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    ls = lines(col)
    bullet = F.size(F.filter(ls, lambda l: F.trim(l).rlike(r"^[-*•]")))
    return F.when(F.size(ls) > 0, bullet / F.size(ls)).otherwise(F.lit(0.0))


def ellipsis_line_fraction(col: Column) -> Column:
    """Fraction of lines ending with an ellipsis ('...' or '…')."""
    ls = lines(col)
    ell = F.size(F.filter(ls, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    return F.when(F.size(ls) > 0, ell / F.size(ls)).otherwise(F.lit(0.0))


FEATURE_COLS: tuple[str, ...] = (
    "_nchars", "_ws", "_lws", "_nw", "_sum_wlen", "_n_stop", "_n_distinct",
    "_g2", "_g3", "_n_sym", "_n_cjk", "_n_alpha_w", "_lines",
)


def with_text_features(df, text_col: str = "text"):
    """Attach the shared text-feature columns in THREE chained projections
    (each building on the previous), so every expensive array (`split`,
    lower-cased words, n-grams) is computed exactly once per row.

    Why not one flat projection of rule expressions: Catalyst's
    CollapseProject would be fine, but each rule re-deriving `split(...)`
    multiplies interpreted higher-order-function work ~10×.  Sharing the
    arrays turned the sf0.1 rule stage from ~19s to ~2s.
    """
    c = F.col(text_col)
    step1 = df.select(
        "*",
        F.length(c).alias("_nchars"),
        words(c).alias("_ws"),
        F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")).alias("_n_sym"),
        F.length(
            F.regexp_replace(
                c, r"[^\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]", ""
            )
        ).alias("_n_cjk"),
        F.split(c, r"\n").alias("_lines"),
    )
    ws = F.col("_ws")
    step2 = step1.select(
        "*",
        F.transform(ws, lambda x: F.lower(x)).alias("_lws"),
        F.size(ws).alias("_nw"),
        F.aggregate(ws, F.lit(0), lambda a, x: a + F.length(x)).alias("_sum_wlen"),
        F.size(F.filter(ws, lambda x: x.rlike(r"\p{L}"))).alias("_n_alpha_w"),
    )
    lws = F.col("_lws")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    step3 = step2.select(
        "*",
        F.size(F.filter(lws, lambda x: F.array_contains(stop_arr, x))).alias("_n_stop"),
        F.size(F.array_distinct(lws)).alias("_n_distinct"),
        ngrams_from_words(lws, 2).alias("_g2"),
        ngrams_from_words(lws, 3).alias("_g3"),
    )
    return step3


def cjk_ratio(col: Column) -> Column:
    """Fraction of code points that are CJK ideographs / kana / hangul.

    Word-based heuristics are meaningless for unsegmented scripts; rules use
    this to switch to char-count bounds (same RE2-safe ranges as the
    pattern profiler).
    """
    cjk = F.length(
        F.regexp_replace(
            col, r"[^\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]", ""
        )
    )
    return F.when(F.length(col) > 0, cjk / F.length(col)).otherwise(F.lit(0.0))


def alpha_word_fraction(col: Column) -> Column:
    """Fraction of words containing at least one alphabetic character (C4 rule)."""
    w = words(col)
    alpha = F.size(F.filter(w, lambda x: x.rlike(r"\p{L}")))
    return F.when(F.size(w) > 0, alpha / F.size(w)).otherwise(F.lit(0.0))
