"""Adversarial-input parity: native exprs vs Arrow kernel vs Python oracle
on a seeded fuzz corpus of edge-case strings (unicode, emoji, whitespace
zoo, long runs, empties) — the hardening behind the feature-parity claim."""

import random
import string

import pyspark.sql.functions as F

from data_quality_spark.functions.textstats import FEATURE_COLS, with_text_features
from data_quality_spark.scrub import scrub_expr, scrub_str

_EDGE_CASES = [
    "",
    " ",
    "\n",
    "\n\n\n",
    "a",
    "  leading and trailing  ",
    "tab\tsep\tvalues",
    "mixed 中文 and english words here",
    "ＦＵＬＬＷＩＤＴＨ　ｔｅｘｔ",
    "emoji 🎉 in 🎉 text 🎉 here",
    "café naïve résumé über",
    "x" * 5000,
    ("word " * 200).strip(),
    "- bullet one\n- bullet two\n- bullet three",
    "line one...\nline two...\nline three",
    "a.b@c.de and 10.0.0.1 and +1 (555) 123-4567",
    "ALL CAPS SHOUTING TEXT HERE",
    "123 456 789 0 numbers only",
    "!@#$ %^&* ()_+ symbols",
    "Ξ ξ Greek Ω characters",
    "русский текст на кириллице",
    "한국어 텍스트 조각",
    "ひらがな と カタカナ",
    " nbsp text",          # non-breaking spaces (NOT Java \s)
    "word​zero​width",     # zero-width space
]


def _fuzz_corpus(n: int = 300, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + " .,!?-\n\t'\"@#中文かcésöß"
    out = list(_EDGE_CASES)
    while len(out) < n:
        ln = rng.randrange(0, 400)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_feature_impls_agree_on_fuzz(spark):
    corpus = _fuzz_corpus()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "i long, text string")
    nat = {
        r["i"]: tuple(r[c] for c in FEATURE_COLS)
        for r in with_text_features(df, impl="native").collect()
    }
    arr = {
        r["i"]: tuple(r[c] for c in FEATURE_COLS)
        for r in with_text_features(df, impl="arrow").collect()
    }
    bad = []
    for i in nat:
        if nat[i] != arr[i]:
            diffs = {
                c: (a, b)
                for c, a, b in zip(FEATURE_COLS, nat[i], arr[i])
                if a != b
            }
            bad.append((corpus[i][:60], diffs))
    assert not bad, bad[:5]


def test_scrub_impls_agree_on_fuzz(spark):
    corpus = _fuzz_corpus(seed=13)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "i long, text string")
    jvm = {r["i"]: r["s"] for r in df.select("i", scrub_expr(F.col("text")).alias("s")).collect()}
    for i, t in enumerate(corpus):
        assert jvm[i].encode() == scrub_str(t).encode(), t[:60]
