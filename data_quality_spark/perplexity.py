"""N-gram language-model perplexity scoring as a vectorized pandas UDF.

Production path: a KenLM binary model memory-mapped once per executor
(lazy singleton, same pattern as langid).  Sandbox path: a deterministic
interpolated character-bigram model with frozen English letter-transition
statistics — same interface, same Arrow plumbing.

Perplexity here = exp(-mean log2... ) convention: we report
``ppl = 2 ** (-avg_log2_prob_per_char)``; junk (symbol soup, repeated
chars, non-prose) scores high, English-like prose scores low.  Pure
per-row function — deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Frozen English letter-bigram log-probabilities (coarse, derived from
# classic letter-frequency tables; smoothed).  Keys: 'ab' etc. over
# a-z + space ('_' denotes space).  Only the most frequent transitions are
# listed; everything else backs off to a uniform floor.
_COMMON_BIGRAMS: dict[str, float] = {
    "th": -3.0, "he": -3.1, "in": -3.2, "er": -3.3, "an": -3.3, "re": -3.4,
    "on": -3.5, "at": -3.5, "en": -3.5, "nd": -3.6, "ti": -3.6, "es": -3.6,
    "or": -3.7, "te": -3.7, "of": -3.7, "ed": -3.8, "is": -3.8, "it": -3.8,
    "al": -3.8, "ar": -3.8, "st": -3.9, "to": -3.9, "nt": -3.9, "ng": -4.0,
    "se": -4.0, "ha": -4.0, "as": -4.0, "ou": -4.0, "io": -4.1, "le": -4.1,
    "ve": -4.1, "co": -4.1, "me": -4.1, "de": -4.2, "hi": -4.2, "ri": -4.2,
    "ro": -4.2, "ic": -4.2, "ne": -4.2, "ea": -4.2, "ra": -4.3, "ce": -4.3,
    "li": -4.3, "ch": -4.3, "ll": -4.3, "be": -4.3, "ma": -4.3, "si": -4.3,
    "om": -4.4, "ur": -4.4, "ca": -4.4, "el": -4.4, "ta": -4.4, "la": -4.4,
    "ns": -4.4, "di": -4.4, "fo": -4.4, "ho": -4.4, "pe": -4.4, "ec": -4.5,
    "pr": -4.5, "no": -4.5, "ct": -4.5, "us": -4.5, "ac": -4.5, "ot": -4.5,
    "il": -4.5, "tr": -4.5, "ly": -4.5, "nc": -4.5, "et": -4.5, "ut": -4.5,
    "ss": -4.6, "so": -4.6, "rs": -4.6, "un": -4.6, "lo": -4.6, "wa": -4.6,
    "ge": -4.6, "ie": -4.6, "wh": -4.6, "ee": -4.6, "wi": -4.6, "em": -4.6,
    "ad": -4.6, "ol": -4.6, "rt": -4.6, "po": -4.6, "we": -4.6, "na": -4.6,
    "ul": -4.7, "ni": -4.7, "ts": -4.7, "mo": -4.7, "ow": -4.7, "pa": -4.7,
    "im": -4.7, "mi": -4.7, "ai": -4.7, "sh": -4.7, "ir": -4.7, "su": -4.7,
    "id": -4.7, "os": -4.7, "iv": -4.7, "ia": -4.7, "am": -4.7, "fi": -4.7,
    "ci": -4.7, "vi": -4.7, "pl": -4.7, "ig": -4.7, "tu": -4.7, "ev": -4.8,
    "ld": -4.8, "ry": -4.8, "mp": -4.8, "fe": -4.8, "bl": -4.8, "ab": -4.8,
    "gh": -4.8, "ty": -4.8, "op": -4.8, "wo": -4.8, "sa": -4.8, "ay": -4.8,
    "ex": -4.8, "ke": -4.8, "fr": -4.8, "oo": -4.8, "av": -4.8, "ag": -4.8,
    "if": -4.8, "ap": -4.8, "gr": -4.8, "od": -4.8, "bo": -4.8, "sp": -4.9,
    "rd": -4.9, "do": -4.9, "uc": -4.9, "bu": -4.9, "ei": -4.9, "ov": -4.9,
    "by": -4.9, "rm": -4.9, "ep": -4.9, "tt": -4.9, "ye": -4.9, "ny": -4.9,
    "ck": -4.9, "ui": -4.9, "ru": -4.9, "um": -4.9, "pp": -4.9, "da": -4.9,
    # space transitions — word boundaries are frequent in prose
    "e_": -2.9, "s_": -3.1, "t_": -3.2, "d_": -3.3, "n_": -3.3, "y_": -3.5,
    "r_": -3.6, "o_": -3.6, "f_": -3.8, "a_": -3.8, "g_": -3.9, "h_": -3.9,
    "l_": -4.0, "k_": -4.3, "m_": -4.3, "p_": -4.5, "w_": -4.6, "c_": -4.7,
    "_t": -2.9, "_a": -3.1, "_i": -3.3, "_s": -3.4, "_o": -3.4, "_w": -3.5,
    "_c": -3.6, "_b": -3.7, "_p": -3.7, "_h": -3.7, "_f": -3.8, "_m": -3.8,
    "_d": -3.9, "_r": -4.0, "_e": -4.0, "_l": -4.1, "_n": -4.2, "_g": -4.3,
    "_u": -4.4, "_v": -4.6, "_j": -4.9, "_k": -4.9, "_q": -5.2, "_y": -5.2,
}
_FLOOR = -7.5       # unseen a-z/space bigram
_NON_ALPHA = -8.5   # bigram touching a non [a-z ] char — junk signal
_MAX_CHARS = 4000   # score a bounded prefix; cost O(1) per doc at 100 TB


# 28-class alphabet: a-z → 0-25, '_' (collapsed whitespace) → 26, other → 27.
# _TABLE[i,j] = log2 prob of the bigram — built once; scoring is a pair of
# vectorized numpy lookups (the per-char Python loop was the dominant cost
# of the fused analysis stage).
import re as _re

import numpy as _np

# Unicode \s matches what str.isspace() matches - preserves the
# original per-char collapse semantics
_RE_WS_RUN = _re.compile(r"\s+", _re.UNICODE)


def _build_table() -> "_np.ndarray":
    t = _np.full((28, 28), _NON_ALPHA, dtype="float64")
    t[:27, :27] = _FLOOR
    for bg, lp in _COMMON_BIGRAMS.items():
        i = 26 if bg[0] == "_" else ord(bg[0]) - 97
        j = 26 if bg[1] == "_" else ord(bg[1]) - 97
        t[i, j] = lp
    return t


_TABLE = _build_table()


class _CharBigramLM:
    """Deterministic fallback LM. score(batch) -> pd.Series of perplexity."""

    def score(self, texts: pd.Series) -> pd.Series:
        out: list[float] = []
        for t in texts:
            if t is None or not str(t).strip():
                out.append(float("inf"))
                continue
            out.append(self._ppl(str(t)[:_MAX_CHARS]))
        return pd.Series(out, dtype="float64")

    @staticmethod
    def _ppl(s: str) -> float:
        # normalize: lowercase, collapse whitespace runs to one '_'
        ns = _RE_WS_RUN.sub("_", s.lower())
        if len(ns) < 2:
            return float("inf")
        # classify code units: a-z → 0-25, '_' → 26, everything else → 27
        # (utf-16 code units: astral chars appear as surrogates — class 27,
        # exactly what "other" means)
        u = _np.frombuffer(ns.encode("utf-16-le"), dtype="<u2").astype("int64")
        if len(u) < 2:
            return float("inf")
        cls = _np.full(u.shape, 27, dtype="int64")
        alpha = (u >= 97) & (u <= 122)
        cls[alpha] = u[alpha] - 97
        cls[u == 95] = 26
        lp = _TABLE[cls[:-1], cls[1:]]
        # denominator = number of code-unit transitions (astral chars occupy
        # two units; numerator and denominator must count the same pairs)
        avg_log2 = float(lp.sum()) / (len(u) - 1)
        return round(2.0 ** (-avg_log2), 4)


_LM = None


def _get_lm():
    global _LM
    if _LM is None:
        try:  # real KenLM if present (public PyPI `kenlm`)
            import kenlm  # noqa: F401

            class _KenLM:
                def __init__(self):
                    import os

                    path = os.environ.get("DQS_KENLM_MODEL", "")
                    self._m = kenlm.Model(path)

                def score(self, texts: pd.Series) -> pd.Series:
                    vals = []
                    for t in texts:
                        s = (t or "").replace("\n", " ")
                        words = s.split()
                        if not words:
                            vals.append(float("inf"))
                            continue
                        lp = self._m.score(s, bos=True, eos=True)
                        vals.append(10.0 ** (-lp / max(1, len(words) + 1)))
                    return pd.Series(vals, dtype="float64")

            _LM = _KenLM()
        except ImportError:
            _LM = _CharBigramLM()
    return _LM


@F.pandas_udf(DoubleType())
def perplexity(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator pandas UDF: LM loaded once per task stream, Arrow-batched."""
    lm = _get_lm()
    for texts in batches:
        yield lm.score(texts)


def perplexity_expr(text_col: Column) -> Column:
    return perplexity(text_col)
