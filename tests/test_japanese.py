"""Japanese text operators — transliteration, number normalization,
kana conversion, tokenization fallback."""

import pyspark.sql.functions as F

from data_quality_spark.functions import japanese as JP


def test_katakana_to_romaji_scalar():
    assert JP.katakana_to_romaji_str("カタカナ") == "katakana"
    assert JP.katakana_to_romaji_str("トウキョウ") == "toukyou"
    assert JP.katakana_to_romaji_str("シャツ") == "shatsu"
    assert JP.katakana_to_romaji_str("ラッパ") == "rappa"     # sokuon doubles
    assert JP.katakana_to_romaji_str("コーヒー") == "ko-hi-"
    assert JP.katakana_to_romaji_str("abcカナ") == "abckana"  # pass-through


def test_kanji_numbers():
    cases = {
        "五": 5, "十": 10, "十五": 15, "二十三": 23, "百": 100,
        "三百四十五": 345, "千九百八十四": 1984, "一万二千三百四十五": 12345,
        "三億": 300_000_000,
    }
    for k, v in cases.items():
        assert JP.kanji_number_to_int(k) == v, k
    assert JP.kanji_number_to_int("五x") is None


def test_normalize_numbers_in_text():
    assert (
        JP.normalize_japanese_numbers_str("価格は三百四十五円です")
        == "価格は345円です"
    )


def test_kuromoji_lite_reference_vectors():
    """The kuromoji-lite lattice reproduces TextTokenizerTest's expected
    tokenizations exactly (jp/tokenization/TextTokenizerTest.java:27-41)
    — compound particle について kept whole, verb stem 食べ split from
    auxiliary たい, honorific お split, latin runs preserved, punctuation
    as tokens, whitespace delimiting but never emitted."""
    vectors = {
        "Talend Readlime Bigdata Platformの価格については、営業までお問い合わせください。": [
            "Talend", "Readlime", "Bigdata", "Platform", "の", "価格",
            "について", "は", "、", "営業", "まで", "お", "問い合わせ",
            "ください", "。",
        ],
        "お寿司が食べたい。": ["お", "寿司", "が", "食べ", "たい", "。"],
        "おsushiが食べたい。": ["お", "sushi", "が", "食べ", "たい", "。"],
    }
    for text, want in vectors.items():
        assert JP.kuromoji_lite_tokenize(text) == want, text
        assert JP.kuromoji_lite_tokenized_string(text) == " ".join(want)


def test_spark_udfs(spark):
    df = spark.createDataFrame([("カタカナ テスト",), ("三百円",)], "t string")
    rows = df.select(
        JP.katakana_to_romaji(F.col("t")).alias("r"),
        JP.normalize_japanese_numbers(F.col("t")).alias("n"),
        JP.katakana_to_hiragana(F.col("t")).alias("h"),
        JP.tokenize_japanese(F.col("t")).alias("tok"),
    ).collect()
    assert rows[0]["r"] == "katakana tesuto"
    assert rows[1]["n"] == "300円"
    assert rows[0]["h"] == "かたかな てすと"
    assert rows[0]["tok"] == ["カタカナ", "テスト"]
    assert rows[1]["tok"] == ["三百円"]
