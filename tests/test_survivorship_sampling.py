"""Survivorship rules + sampling operators (hand-computed goldens)."""

import pyspark.sql.functions as F
import pytest

from data_quality_spark.operators import sampling as S
from data_quality_spark.operators import survivorship as SV


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        ("g1", "alice", 30, "2024-01-01", "x@a.com"),
        ("g1", "Alice", 31, "2024-03-01", None),
        ("g1", "ALICE Smith", 29, "2024-02-01", ""),
        ("g2", "bob", 40, "2024-01-15", "b@b.com"),
    ]
    return spark.createDataFrame(rows, "g string, name string, age int, d string, email string")


def test_survivorship_rules(records):
    out = SV.survive(
        records,
        ["g"],
        {
            "largest_age": SV.largest(F.col("age")),
            "smallest_age": SV.smallest(F.col("age")),
            "longest_name": SV.longest(F.col("name")),
            "shortest_name": SV.shortest(F.col("name")),
            "newest_name": SV.most_recent(F.col("name"), F.col("d")),
            "oldest_name": SV.most_ancient(F.col("name"), F.col("d")),
            "email_filled": SV.fill_empty(F.col("email"), "none@x.com"),
            "not_alice": SV.exclude_values(F.col("name"), ["alice", "Alice"]),
            "regex_pick": SV.match_regex(F.col("name"), r"^[A-Z]+$"),
            "concat": SV.concatenate(F.col("name"), "|"),
        },
    )
    g1 = {r["g"]: r for r in out.collect()}["g1"]
    assert g1["largest_age"] == 31 and g1["smallest_age"] == 29
    assert g1["longest_name"] == "ALICE Smith"
    assert g1["shortest_name"] == "Alice"  # length tie → lexicographically smallest
    assert g1["newest_name"] == "Alice"       # 2024-03-01
    assert g1["oldest_name"] == "alice"       # 2024-01-01
    assert g1["email_filled"] == "x@a.com"    # only non-empty value
    assert g1["not_alice"] == "ALICE Smith"
    assert g1["regex_pick"] is None           # 'ALICE Smith' has a space → no match
    assert g1["concat"] == "ALICE Smith|Alice|alice"


def test_most_common_deterministic(spark):
    df = spark.createDataFrame(
        [("g", "x"), ("g", "x"), ("g", "y"), ("g", "z")], "g string, v string"
    )
    out = SV.most_common_deterministic(df, ["g"], "v").collect()[0]
    assert out["survivor"] == "x"


def test_most_complete_row(spark):
    df = spark.createDataFrame(
        [("g", "a", None, None), ("g", "b", "1", "2")],
        "g string, x string, y string, z string",
    )
    out = SV.most_complete_row(df, ["g"], ["x", "y", "z"]).collect()[0]
    assert (out["x"], out["y"], out["z"]) == ("b", "1", "2")


def test_reservoir_determinism(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in S.reservoir_k(df, 10, "k").collect())
    b = sorted(r["k"] for r in S.reservoir_k(df.repartition(7), 10, "k").collect())
    assert a == b and len(a) == 10
    c = sorted(r["k"] for r in S.reservoir_k(df, 10, "k", seed=43).collect())
    assert a != c  # different seed → different sample


def test_sample_fraction_rate(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    n = S.sample_fraction(df, 0.1, "k").count()
    assert 1800 <= n <= 2200  # ±10% of expected


def test_weighted_reservoir_bias(spark):
    # weight 100 vs 1: heavy items must dominate the sample
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, 100.0).otherwise(1.0).alias("w"),
    )
    got = [r["k"] for r in S.weighted_reservoir_k(df, 50, "k", "w").collect()]
    heavy = sum(1 for k in got if k < 100)
    assert heavy >= 35  # 100 heavy items at 100x weight dominate top-50


def test_top_n(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    got = [r["k"] for r in S.top_n(df, 5, "k", ascending=False).collect()]
    assert got == [99, 98, 97, 96, 95]


def test_stratified_reservoir_exact_and_prefilter_safe(spark):
    # 3 strata of very different sizes: the oversample prefilter must
    # produce EXACTLY the naive full-window result, and small strata
    # (n <= k) must be kept whole
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 100 == 0, "rare")
        .when(F.col("id") % 3 == 0, "mid")
        .otherwise("big")
        .alias("st"),
    )
    got = S.stratified_reservoir_k(df, 30, "st", "k", seed=7)
    rows = sorted((r["st"], r["k"], r["rank_in_stratum"]) for r in got.collect())

    # naive oracle: full window, no prefilter
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit("7:"), F.col("k").cast("string")))
    w = Window.partitionBy("st").orderBy(h.asc(), F.col("k").asc())
    naive = (
        df.select("st", "k", F.row_number().over(w).cast("bigint").alias("rank_in_stratum"))
        .filter(F.col("rank_in_stratum") <= 30)
    )
    assert rows == sorted((r["st"], r["k"], r["rank_in_stratum"]) for r in naive.collect())

    per = {r["st"]: r["c"] for r in got.groupBy("st").agg(F.count("*").alias("c")).collect()}
    assert per == {"big": 30, "mid": 30, "rare": 30}

    # a stratum smaller than k is returned in full
    tiny = S.stratified_reservoir_k(df.filter(F.col("st") == "rare"), 500, "st", "k")
    assert tiny.count() == 50
