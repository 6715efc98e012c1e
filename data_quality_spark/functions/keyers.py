"""Blocking-key scalar functions and fingerprint keyers.

Reference: `record/linkage/genkey/impl/windowkey/AlgoBox.java:75-394` (the
blocking-key function library: pick_Char, first_N_*, soundex, fingerprint,
nGram key, …) and `FingerprintKeyer.java:43-59` / `NGramFingerprintKeyer.
java:43-69`.  All native column expressions — blocking keys run on every
row of the corpus, so they must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Latin-1 diacritic folding (FingerprintKeyer.asciify analog) via translate —
# covers the Latin-1 supplement range the reference folds.
_DIACRITICS_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_DIACRITICS_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def remove_diacritics(c: Column) -> Column:
    """AlgoBox.removeDiacriticalMarks (Latin-1 coverage via translate)."""
    return F.translate(c, _DIACRITICS_SRC, _DIACRITICS_DST)


def fingerprint_key(c: Column) -> Column:
    """FingerprintKeyer: trim → lower → strip punct/control → fold
    diacritics → split → sort + dedupe tokens → join
    (`windowkey/FingerprintKeyer.java:43-59`; we fold BEFORE sorting —
    the reference folds last, which makes accented tokens sort after 'z'
    and produce different keys for 'Émile Zola' vs 'Emile Zola'.
    Folding first is the better blocking key; documented divergence)."""
    cleaned = remove_diacritics(
        F.regexp_replace(F.lower(F.trim(c)), r"[\p{Punct}\p{Cntrl}]", "")
    )
    tokens = F.filter(F.split(cleaned, r"\s+"), lambda x: x != F.lit(""))
    return F.array_join(F.array_sort(F.array_distinct(tokens)), " ")


def ngram_fingerprint_key(c: Column, n: int = 2) -> Column:
    """NGramFingerprintKeyer: lower → strip punct+space → sorted set of
    char n-grams → join → fold (`windowkey/NGramFingerprintKeyer.java:43-69`)."""
    cleaned = remove_diacritics(
        F.regexp_replace(F.lower(c), r"[\p{Punct}\p{Cntrl}\s]", "")
    )
    ln = F.length(cleaned)
    grams = F.when(
        ln >= n,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), ln - (n - 1)),
                    lambda i: cleaned.substr(i, F.lit(n)),
                )
            )
        ),
    ).otherwise(F.array(cleaned))
    return F.array_join(grams, "")


# --- AlgoBox scalar key functions ------------------------------------------


def pick_char(c: Column, positions: list[int]) -> Column:
    """AlgoBox.pick_Char (1-based positions)."""
    return F.concat(*[F.substring(c, p, 1) for p in positions])


def first_n_chars(c: Column, n: int) -> Column:
    return F.substring(c, 1, n)


def last_n_chars(c: Column, n: int) -> Column:
    return F.substring(c, -n, n)


def first_n_chars_each_word(c: Column, n: int) -> Column:
    """AlgoBox.first_N_Char_EW."""
    words = F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))
    return F.array_join(F.transform(words, lambda w: F.substring(w, 1, n)), "")


def first_n_consonants(c: Column, n: int) -> Column:
    return F.substring(F.regexp_replace(c, r"[^bcdfghjklmnpqrstvwxyzBCDFGHJKLMNPQRSTVWXYZ]", ""), 1, n)


def first_n_vowels(c: Column, n: int) -> Column:
    return F.substring(F.regexp_replace(c, r"[^aeiouAEIOU]", ""), 1, n)


def soundex_key(c: Column) -> Column:
    return F.soundex(c)


def add_left_char(c: Column, ch: str) -> Column:
    return F.concat(F.lit(ch), c)


def add_right_char(c: Column, ch: str) -> Column:
    return F.concat(c, F.lit(ch))


def use_default(c: Column, default: str) -> Column:
    return F.when(c.isNull() | (F.trim(c) == ""), F.lit(default)).otherwise(c)


def compose_key(*parts: Column) -> Column:
    """Blocking-key chains are just expression composition
    (`genkey/BlockingKeyHandler.java:70-101`)."""
    return F.concat(*parts)


# --- Phonetic blocking keys (AlgoBox metaphone/doublemetaphone/cologne,
# `windowkey/AlgoBox.java:283-398`, plus the reference's SoundexFR) --------
#
# These run pure-Python encoders inside ONE Arrow-batched pandas UDF per key
# column — still vectorized transfer, and blocking keys are computed once per
# row then reused across the self-join, so the Python cost is O(corpus), not
# O(pairs).


def _phonetic_key(fn):
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _k(s):
        return s.map(lambda v: None if v is None else fn(str(v)))

    return _k


def metaphone_key(c: Column) -> Column:
    """AlgoBox.metaphone (`windowkey/AlgoBox.java:291-296`)."""
    from .phonetics import metaphone

    return _phonetic_key(metaphone)(c)


def double_metaphone_key(c: Column) -> Column:
    """AlgoBox.doublemetaphone (`windowkey/AlgoBox.java:283-288`)."""
    from .phonetics import double_metaphone_primary

    return _phonetic_key(double_metaphone_primary)(c)


def cologne_phonetic_key(c: Column) -> Column:
    """AlgoBox.colognePhonetic (`windowkey/AlgoBox.java:394-398`)."""
    from .phonetics import cologne_phonetic

    return _phonetic_key(cologne_phonetic)(c)


def soundex_fr_key(c: Column) -> Column:
    """SoundexFR code (`contribs/algorithm/SoundexFR.java:73-211`)."""
    from .phonetics import soundex_fr

    return _phonetic_key(soundex_fr)(c)
