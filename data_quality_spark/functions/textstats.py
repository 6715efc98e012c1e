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

import pandas as pd
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


# Scalar feature columns shared by the rule registry.  Two implementations
# produce them identically:
# - 'native': Catalyst expressions (used by the oracle-checked profiling
#   queries — every value reproducible in DuckDB SQL);
# - 'arrow':  ONE vectorized pandas UDF computing all features per batch
#   (the pipeline hot path).  Spark's higher-order array functions are
#   interpreted, ~µs per array element; thirteen features × hundreds of
#   words per doc made the native rule stage the scaling bottleneck
#   (it alone ran 3-5× slower than langid+ppl+scrub combined and scaled at
#   1.5×/4-cores vs their 2.5×).  The Arrow pass restores UDF-stage scaling.
# Equality of the two implementations is pytest-asserted on the fixture
# corpus (test_rules_feature_parity).
FEATURE_COLS: tuple[str, ...] = (
    "_nchars", "_nw", "_sum_wlen", "_n_stop", "_n_distinct",
    "_n_g2", "_n_g2_distinct", "_n_g3", "_n_g3_distinct",
    "_n_sym", "_n_cjk", "_n_alpha_w", "_n_lines", "_n_bullet", "_n_ellipsis",
)

_CJK_CLASS = r"[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]"

def with_text_features_native(df, text_col: str = "text"):
    """Native-expression feature computation (chained projections so each
    expensive array is built once)."""
    c = F.col(text_col)
    cjk_count = F.when(
        c.rlike(_CJK_CLASS),
        F.length(c) - F.length(F.regexp_replace(c, _CJK_CLASS, "")),
    ).otherwise(F.lit(0))
    step1 = df.select(
        "*",
        F.length(c).alias("_nchars"),
        words(c).alias("__ws"),
        F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")).alias("_n_sym"),
        cjk_count.alias("_n_cjk"),
        F.split(c, r"\n").alias("__lines"),
    )
    ws = F.col("__ws")
    lines = F.col("__lines")
    step2 = step1.select(
        "*",
        F.transform(ws, lambda x: F.lower(x)).alias("__lws"),
        F.size(ws).alias("_nw"),
        F.aggregate(ws, F.lit(0), lambda a, x: a + F.length(x)).alias("_sum_wlen"),
        F.size(F.filter(ws, lambda x: x.rlike(r"\p{L}"))).alias("_n_alpha_w"),
        F.size(lines).alias("_n_lines"),
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))).alias("_n_bullet"),
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))).alias("_n_ellipsis"),
    )
    lws = F.col("__lws")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    step3 = step2.select(
        "*",
        F.size(F.filter(lws, lambda x: F.array_contains(stop_arr, x))).alias("_n_stop"),
        F.size(F.array_distinct(lws)).alias("_n_distinct"),
        ngrams_from_words(lws, 2).alias("__g2"),
        ngrams_from_words(lws, 3).alias("__g3"),
    )
    step4 = step3.select(
        "*",
        F.size("__g2").alias("_n_g2"),
        F.size(F.array_distinct("__g2")).alias("_n_g2_distinct"),
        F.size("__g3").alias("_n_g3"),
        F.size(F.array_distinct("__g3")).alias("_n_g3_distinct"),
    )
    return step4.drop("__ws", "__lws", "__g2", "__g3", "__lines")


# --- Arrow implementation ---------------------------------------------------

import re as _re

_RE_WS = _re.compile(r"[ \t\n\x0b\f\r]+")          # Java \s (ASCII)
_RE_SYM = _re.compile(r"[^\w \t\n\x0b\f\r]|_")      # ≈ Java [^\p{L}\p{N}\s]
_RE_CJK = _re.compile("[\u3040-\u30FF\u4E00-\u9FFF\uAC00-\uD7AF]")
_RE_LETTER_ANY = _re.compile(r"[^\W\d_]")           # ≈ Java \p{L}
_RE_BULLET = _re.compile(r"^[-*•]")
_RE_ELLIPSIS = _re.compile(r"(\.\.\.|…)[ \t\x0b\f\r]*$")
_STOPSET = frozenset(STOPWORDS)


def compute_features_py(t: str | None) -> tuple:
    """Pure-Python feature kernel — must match the native expressions
    exactly (pytest-asserted).  One pass over the text."""
    if t is None:
        return tuple([None] * len(FEATURE_COLS))
    ws = [w for w in _RE_WS.split(t) if w]
    lws = [w.lower() for w in ws]
    nw = len(ws)
    g2 = list(zip(lws, lws[1:])) if nw >= 2 else []
    g3 = list(zip(lws, lws[1:], lws[2:])) if nw >= 3 else []
    lines = t.split("\n")
    return (
        len(t),
        nw,
        sum(len(w) for w in ws),
        sum(1 for w in lws if w in _STOPSET),
        len(set(lws)),
        len(g2),
        len(set(g2)),
        len(g3),
        len(set(g3)),
        len(_RE_SYM.findall(t)),
        len(_RE_CJK.findall(t)),
        sum(1 for w in ws if _RE_LETTER_ANY.search(w)),
        len(lines),
        sum(1 for l in lines if _RE_BULLET.match(l.strip(" "))),
        sum(1 for l in lines if _RE_ELLIPSIS.search(l)),
    )


def with_text_features_arrow(df, text_col: str = "text"):
    """Arrow-batched feature computation: one pandas UDF → struct → expand."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField(n, IntegerType()) for n in FEATURE_COLS])

    @F.pandas_udf(schema)
    def _features(texts: pd.Series) -> pd.DataFrame:
        rows = [compute_features_py(t) for t in texts]
        return pd.DataFrame(rows, columns=list(FEATURE_COLS))

    out = df.withColumn("__feat", _features(F.col(text_col)))
    return out.select("*", "__feat.*").drop("__feat")


def with_text_features(df, text_col: str = "text", impl: str = "arrow"):
    """Attach the scalar text-feature columns (see FEATURE_COLS)."""
    if impl == "native":
        return with_text_features_native(df, text_col)
    return with_text_features_arrow(df, text_col)


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
