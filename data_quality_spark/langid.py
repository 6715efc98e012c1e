"""Language identification as a vectorized Arrow pandas UDF.

Production path: fastText `lid.176.bin` loaded lazily once per executor
(the reference's lazy-singleton tokenizer pattern,
`dataquality-text-japanese/.../TextTokenizer.java:25-44`), wrapped in an
iterator-of-series pandas UDF so the model loads once per task stream and
Arrow batches bound memory.

Sandbox path (no fastText wheel in this container): a deterministic
character-range + stop-word-profile classifier with the SAME interface and
the same iterator-UDF plumbing, so swapping the model is a one-line change.
Pure function of the input text — invariant under partitioning/parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

# Per-language marker words (function words, frozen).  Deliberately small:
# this is a deterministic sandbox stand-in, not a linguistics claim.
_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "ich"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "nous", "vous", "pas"),
    "es": ("el", "la", "los", "las", "y", "es", "una", "que", "por", "para", "con", "del"),
    "it": ("il", "la", "che", "e", "è", "una", "per", "con", "del", "non", "sono", "questo"),
    "pt": ("o", "a", "os", "as", "e", "é", "uma", "que", "por", "para", "com", "não"),
    "nl": ("de", "het", "een", "en", "is", "van", "dat", "niet", "met", "voor", "zijn", "ik"),
}

import re

_CHAR_RANGES: tuple[tuple[str, int, int], ...] = (
    # (lang, lo, hi) — if >30% of letters fall in the range, classify directly.
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("el", 0x0370, 0x03FF),
    ("he", 0x0590, 0x05FF),
)
# compiled once — classification runs at C speed (findall), not per-char Python
_RE_LETTER = re.compile(r"[^\W\d_]")
_RE_RANGE: tuple[tuple[str, re.Pattern], ...] = tuple(
    (lang, re.compile(f"[{chr(lo)}-{chr(hi)}]")) for lang, lo, hi in _CHAR_RANGES
)
_TOK_STRIP = ".,;:!?()[]\"'"
_MARKER_SETS: dict[str, frozenset[str]] = {k: frozenset(v) for k, v in _MARKERS.items()}

UNKNOWN = "und"


class _HeuristicLangModel:
    """Deterministic fallback model. predict(batch: pd.Series) -> (lang, conf)."""

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        langs: list[str] = []
        confs: list[float] = []
        for t in texts:
            if t is None or not str(t).strip():
                langs.append(UNKNOWN)
                confs.append(0.0)
                continue
            s = str(t)
            lang, conf = self._classify(s)
            langs.append(lang)
            confs.append(conf)
        return pd.DataFrame({"lang": langs, "conf": confs})

    @staticmethod
    def _classify(s: str) -> tuple[str, float]:
        # 1. script detection over the first 2000 code points
        head = s[:2000]
        n = len(_RE_LETTER.findall(head))
        if n:
            for lang, rex in _RE_RANGE:
                hits = len(rex.findall(head))
                if hits / n > 0.30:
                    return lang, round(hits / n, 4)
        # 2. marker-word profile over the first 400 tokens
        toks = head.split()[:400]
        if not toks:
            return UNKNOWN, 0.0
        best_lang, best_hits = UNKNOWN, 0
        for lang, mset in _MARKER_SETS.items():
            hits = 0
            for w in toks:
                if w.strip(_TOK_STRIP).lower() in mset:
                    hits += 1
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        if best_hits == 0:
            return UNKNOWN, 0.0
        return best_lang, round(min(1.0, best_hits / max(1, len(toks)) * 5.0), 4)


_MODEL = None


def _get_model():
    """Lazy per-worker singleton (load once per executor process)."""
    global _MODEL
    if _MODEL is None:
        try:  # real model if available in the image — public fastText API
            import fasttext  # noqa: F401  (not present in sandbox)

            class _FastTextModel:
                def __init__(self):
                    self._m = fasttext.load_model("lid.176.bin")

                def predict(self, texts: pd.Series) -> pd.DataFrame:
                    labels, confs = [], []
                    for t in texts:
                        s = (t or "").replace("\n", " ")
                        lab, p = self._m.predict(s)
                        labels.append(lab[0].replace("__label__", ""))
                        confs.append(float(p[0]))
                    return pd.DataFrame({"lang": labels, "conf": confs})

            _MODEL = _FastTextModel()
        except ImportError:
            _MODEL = _HeuristicLangModel()
    return _MODEL


@F.pandas_udf(StringType())
def detect_lang(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator-of-series pandas UDF: model loaded once per task stream."""
    model = _get_model()
    for texts in batches:
        yield model.predict(texts)["lang"]


@F.pandas_udf(DoubleType())
def detect_lang_conf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _get_model()
    for texts in batches:
        yield model.predict(texts)["conf"]


def lang_expr(text_col: Column) -> Column:
    return detect_lang(text_col)
