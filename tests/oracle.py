"""Driver-side pure-Python oracle for the quality-filter rule spec.

Independent re-implementation of the per-row semantics (words, ratios,
n-grams, CJK gating, decision) used to golden-check the distributed Spark
implementation: same spec, different engine (Python scalars vs Catalyst
expressions).  The langid/perplexity model classes are pure Python and shared
deliberately — the pipeline test validates the Spark *plumbing* around them;
their own behavior is unit-tested separately.

Regex notes: Spark uses Java regex where `\\s` is ASCII-only, so this oracle
uses the explicit ASCII whitespace class everywhere.
"""

from __future__ import annotations

import re
import unicodedata

from data_quality_spark import rules as R
from data_quality_spark.functions.textstats import STOPWORDS
from data_quality_spark.langid import _HeuristicLangModel
from data_quality_spark.perplexity import _MAX_CHARS, _CharBigramLM
from data_quality_spark.scrub import scrub_str
from data_quality_spark.decide import ALLOWED_LANGS, MAX_PERPLEXITY

_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_STOPSET = set(STOPWORDS)
_CJK_RANGES = ((0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xAC00, 0xD7AF))


def _words(text: str) -> list[str]:
    return [w for w in _WS.split(text) if w]


def _is_symbol(ch: str) -> bool:
    if ch in " \t\n\x0b\f\r":
        return False
    cat = unicodedata.category(ch)
    return not (cat.startswith("L") or cat.startswith("N"))


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(1 for ch in text if any(lo <= ord(ch) <= hi for lo, hi in _CJK_RANGES))
    return cjk / len(text)


def _dup_ngram_fraction(ws: list[str], n: int) -> float:
    if len(ws) < n:
        return 0.0
    grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    return 1.0 - len(set(grams)) / len(grams)


def rule_verdicts(text: str | None) -> dict[str, bool]:
    """One boolean per rule, matching rules.RULES semantics exactly."""
    v: dict[str, bool] = {}
    if text is None:
        return {name: False for name in R.RULE_NAMES}
    v["non_empty"] = text.strip(" \t\n\x0b\f\r") != ""
    cjk_gate = _cjk_ratio(text) > R.CJK_GATE_RATIO
    ws = _words(text)
    lws = [w.lower() for w in ws]
    wc = len(ws)

    def gated(val: bool) -> bool:
        return True if cjk_gate else val

    v["word_count"] = gated(R.MIN_WORDS <= wc <= R.MAX_WORDS)
    if wc:
        mwl = sum(len(w) for w in ws) / wc
        v["mean_word_length"] = gated(R.MIN_MEAN_WORD_LEN <= mwl <= R.MAX_MEAN_WORD_LEN)
    else:
        v["mean_word_length"] = gated(False)
    if text:
        sym = sum(1 for ch in text if _is_symbol(ch)) / len(text)
    else:
        sym = 0.0
    v["symbol_ratio"] = sym <= R.MAX_SYMBOL_RATIO
    v["stopwords"] = gated(sum(1 for w in lws if w in _STOPSET) >= R.MIN_STOPWORD_COUNT)
    v["dup_2gram"] = gated(_dup_ngram_fraction(lws, 2) <= R.MAX_DUP_2GRAM_FRACTION)
    v["dup_3gram"] = gated(_dup_ngram_fraction(lws, 3) <= R.MAX_DUP_3GRAM_FRACTION)
    if wc:
        v["distinct_words"] = gated(len(set(lws)) / wc >= R.MIN_DISTINCT_WORD_RATIO)
    else:
        v["distinct_words"] = gated(False)
    if wc:
        alpha = sum(1 for w in ws if any(unicodedata.category(c).startswith("L") for c in w)) / wc
    else:
        alpha = 0.0
    v["alpha_words"] = gated(alpha >= R.MIN_ALPHA_WORD_FRACTION)
    v["char_count_cjk"] = (
        R.MIN_CHARS_CJK <= len(text) <= R.MAX_CHARS_CJK if cjk_gate else True
    )
    lines = text.split("\n")
    bullets = sum(1 for l in lines if re.match(r"^[-*•]", l.strip(" ")))
    v["bullet_lines"] = bullets / len(lines) <= R.MAX_BULLET_LINE_FRACTION
    ell = sum(1 for l in lines if re.search(r"(\.\.\.|…)[ \t\x0b\f\r]*$", l))
    v["ellipsis_lines"] = ell / len(lines) <= R.MAX_ELLIPSIS_LINE_FRACTION
    return v


_langmodel = _HeuristicLangModel()
_lm = _CharBigramLM()


def label_row(text: str | None) -> dict:
    """Full oracle verdict for one document: rules, lang, ppl, keep, scrub."""
    verdicts = rule_verdicts(text)
    if text is None or not text.strip():
        lang, ppl = "und", float("inf")
    else:
        lang, _conf = _langmodel._classify(text)
        ppl = _lm._ppl(text[:_MAX_CHARS])
    lang_ok = lang in ALLOWED_LANGS
    ppl_ok = (ppl <= MAX_PERPLEXITY) if lang == "en" else True
    keep = all(verdicts.values()) and lang_ok and ppl_ok
    return {
        "verdicts": verdicts,
        "lang": lang,
        "ppl": ppl,
        "keep": keep,
        "scrubbed": scrub_str(text),
    }
