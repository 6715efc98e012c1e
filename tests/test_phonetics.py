"""Phonetic encoder/matcher tests mirroring the reference's test vectors
(`attribute/MetaphoneMatcherTest.java`, `DoubleMetaphoneMatcherTest.java`)
plus public known-good encoder vectors."""

import pytest

from data_quality_spark.functions import phonetics as ph

EPS = 1e-9


class TestMetaphoneMatcher:
    """Mirrors MetaphoneMatcherTest.testGetWeight / null tests."""

    def test_john_jon(self):
        assert ph.metaphone_weight("John", "Jon") == pytest.approx(1.0, abs=EPS)

    def test_blank_same(self):
        assert ph.metaphone_weight(" ", " ") == pytest.approx(1.0, abs=EPS)

    def test_numeric_same_and_diff(self):
        assert ph.metaphone_weight("23", "23") == pytest.approx(1.0, abs=EPS)
        assert ph.metaphone_weight("23", "64") != 1.0

    def test_code_truncation_long_strings(self):
        assert ph.metaphone_weight("JohnFit", "JohnFitzgeraldKennedy") == 1.0

    def test_newline_vs_word(self):
        assert ph.metaphone_weight("\n", "Hulme") == 0.0

    def test_nulls(self):
        assert ph.metaphone_weight(None, "Jon") == pytest.approx(0.0, abs=EPS)
        assert ph.metaphone_weight(None, None) == pytest.approx(1.0, abs=EPS)


class TestDoubleMetaphoneMatcher:
    """Mirrors DoubleMetaphoneMatcherTest.testGetWeight."""

    def test_john_jon(self):
        assert ph.double_metaphone_weight("John", "Jon") == pytest.approx(1.0, abs=EPS)

    def test_numeric(self):
        assert ph.double_metaphone_weight("23", "23") == pytest.approx(1.0, abs=EPS)
        assert ph.double_metaphone_weight("23", "64") != 1.0

    def test_blank_yields_zero(self):
        # blank input encodes to null (cleanInput) -> weight 0, unlike Metaphone
        assert ph.double_metaphone_weight(" ", " ") == pytest.approx(0.0, abs=EPS)

    def test_code_truncation_long_strings(self):
        assert ph.double_metaphone_weight("JohnFit", "JohnFitzgeraldKennedy") == 1.0

    def test_newline_vs_word(self):
        assert ph.double_metaphone_weight("\n", "Hulme") == 0.0


METAPHONE_VECTORS = {
    # public commons-codec MetaphoneTest vectors
    "howl": "HL", "testing": "TSTN", "The": "0", "quick": "KK",
    "brown": "BRN", "fox": "FKS", "jumped": "JMPT", "over": "OFR",
    "lazy": "LS", "dogs": "TKS", "music": "MSK", "knight": "NT",
    "wright": "RT", "xavier": "SFR", "science": "SNS",
}

DM_PRIMARY_VECTORS = {
    "testing": "TSTN", "The": "0", "quick": "KK", "brown": "PRN",
    "fox": "FKS", "jumped": "JMPT", "over": "AFR", "lazy": "LS",
    "dogs": "TKS", "smith": "SM0", "schmidt": "XMT",
    "snider": "SNTR", "schneider": "XNTR",
}


@pytest.mark.parametrize("word,code", sorted(METAPHONE_VECTORS.items()))
def test_metaphone_vectors(word, code):
    assert ph.metaphone(word) == code


@pytest.mark.parametrize("word,code", sorted(DM_PRIMARY_VECTORS.items()))
def test_double_metaphone_vectors(word, code):
    assert ph.double_metaphone(word)[0] == code


def test_double_metaphone_alternate():
    assert ph.double_metaphone("smith") == ("SM0", "XMT")
    assert ph.double_metaphone("schmidt") == ("XMT", "SMT")


def test_cologne_vectors():
    # public Kölner Phonetik vectors
    assert ph.cologne_phonetic("Müller-Lüdenscheidt") == "65752682"
    assert ph.cologne_phonetic("Breschnew") == "17863"
    assert ph.cologne_phonetic("Wikipedia") == "3412"
    assert ph.cologne_phonetic("") == ""
    assert ph.cologne_phonetic(None) is None


def test_soundex_fr_contract():
    # SoundexFR.java contract: 4-char padded codes, blank/weird inputs safe
    assert ph.soundex_fr("") == "    "
    assert ph.soundex_fr("y") == "Y   "
    assert len(ph.soundex_fr("Martin")) == 4
    assert ph.soundex_fr("Martin") == ph.soundex_fr("Marthin")  # silent H
    assert ph.soundex_fr_weight("Martin", "Marthin") == 1.0
    assert ph.soundex_fr_weight(None, None) == 1.0
    assert ph.soundex_fr_weight(None, "x") == 0.0


def test_phonetic_spark_keys(spark):
    from pyspark.sql import functions as F

    from data_quality_spark.functions import keyers

    df = spark.createDataFrame(
        [(1, "John"), (2, "Jon"), (3, "Schmidt"), (4, None)], "id long, name string"
    )
    out = {
        r["id"]: (r["m"], r["dm"], r["cp"], r["sf"])
        for r in df.select(
            "id",
            keyers.metaphone_key(F.col("name")).alias("m"),
            keyers.double_metaphone_key(F.col("name")).alias("dm"),
            keyers.cologne_phonetic_key(F.col("name")).alias("cp"),
            keyers.soundex_fr_key(F.col("name")).alias("sf"),
        ).collect()
    }
    assert out[1][0] == out[2][0] == "JN"       # metaphone blocks John/Jon together
    assert out[1][1] == out[2][1] == "JN"
    assert out[3] == ("SKMT", "XMT", "862", "SMD ")
    assert out[4] == (None, None, None, None)


def test_phonetic_record_matchers_on_spark(spark):
    from pyspark.sql import functions as F

    from data_quality_spark.operators.matching import py_matcher_weight

    df = spark.createDataFrame(
        [("John", "Jon"), ("Wright", "Write"), (None, None)], "a string, b string"
    )
    rows = df.select(
        py_matcher_weight("metaphone", F.col("a"), F.col("b")).alias("m"),
        py_matcher_weight("double_metaphone", F.col("a"), F.col("b")).alias("dm"),
        py_matcher_weight("soundex_fr", F.col("a"), F.col("b")).alias("sf"),
    ).collect()
    assert rows[0]["m"] == 1.0 and rows[0]["dm"] == 1.0
    assert rows[2]["m"] == 1.0 and rows[2]["dm"] == 1.0  # both-null -> 1.0
