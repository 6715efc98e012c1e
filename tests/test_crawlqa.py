"""Round-5 crawl-QA extensions: script profiling, mojibake detection,
robots-meta extraction — unit vectors + expression/plan properties."""

from pyspark.sql import functions as F

from data_quality_spark.operators.htmltext import robots_meta_expr
from data_quality_spark.operators.text_analysis import (
    MOJIBAKE_ARTIFACTS,
    mojibake_metrics,
    script_profile,
)


def _one_row(spark, text, cols):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(*cols).collect()[0]


def test_script_profile_vectors(spark):
    r = _one_row(spark, "abc привет 你好 こんにちは 안녕 مرحبا αβ 42", script_profile(F.col("t")))
    assert r["n_latin"] == 3
    assert r["n_cyrillic"] == 6
    assert r["n_han"] == 2
    assert r["n_kana"] == 5
    assert r["n_hangul"] == 2
    assert r["n_arabic"] == 5
    assert r["n_greek"] == 2
    assert r["n_digit"] == 2
    assert r["dominant_script"] == "cyrillic"


def test_script_profile_tie_and_none(spark):
    # tie between latin (2) and cyrillic (2): first class in
    # SCRIPT_CLASSES order wins — latin
    r = _one_row(spark, "ab пр", script_profile(F.col("t")))
    assert r["dominant_script"] == "latin"
    # digits alone never dominate; no letters at all -> 'none'
    r = _one_row(spark, "12345 !!", script_profile(F.col("t")))
    assert r["dominant_script"] == "none"


def test_mojibake_vectors(spark):
    r = _one_row(spark, "cafÃ© dÃ©jÃ  vu", mojibake_metrics(F.col("t")))
    assert r["n_mojibake"] == 2  # Ã© twice; 'Ã ' is not in the artifact set
    assert r["n_replacement"] == 0
    assert r["is_mojibake"] is True
    r = _one_row(spark, "clean text", mojibake_metrics(F.col("t")))
    assert (r["n_mojibake"], r["n_replacement"], r["is_mojibake"]) == (0, 0, False)
    r = _one_row(spark, "x � y �", mojibake_metrics(F.col("t")))
    assert r["n_replacement"] == 2 and r["is_mojibake"] is True


def test_mojibake_artifacts_substring_free():
    """The count device (independent per-artifact occurrence counts)
    is only double-count-safe if no artifact occurs as a SUBSTRING of
    another (strictly stronger than prefix-freedom)."""
    for a in MOJIBAKE_ARTIFACTS:
        for b in MOJIBAKE_ARTIFACTS:
            if a != b:
                assert a not in b, (a, b)


def test_robots_meta_vectors(spark):
    cases = [
        ('<head><meta name="robots" content="noindex, nofollow"></head>', ("noindex, nofollow", True, True)),
        ('<head><META NAME="robots" CONTENT="NOINDEX"></head>', ("noindex", True, False)),
        ('<head><meta name="robots" content="index, follow"></head>', ("index, follow", False, False)),
        ('<head><meta name="robots" content="none"></head>', ("none", True, True)),
        ("<head><title>no meta</title></head>", ("", False, False)),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["t"])
    got = df.select(*robots_meta_expr(F.col("t"))).collect()
    for r, (_, exp) in zip(got, cases):
        assert (r["robots_content"], r["noindex"], r["nofollow"]) == exp


def test_crawlqa_plans_have_no_exchange(spark):
    """All three operators are per-row expressions — no shuffle at any
    corpus size."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for cols in (
        script_profile(F.col("text")),
        mojibake_metrics(F.col("text")),
        robots_meta_expr(F.col("text")),
    ):
        plan = df.select(*cols)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
