"""CSV inference source + standardization + masking + anyorder matcher."""

import pyspark.sql.functions as F
import pytest

from data_quality_spark.operators import standardize as ST
from data_quality_spark.operators.matching import anyorder_weight
from data_quality_spark.sources.readers import read_csv_inferred

SYNS = {
    "Robert": ["bob", "rob", "bobby"],
    "Elizabeth": ["liz", "beth", "lizzy"],
}


def test_read_csv_inferred(spark, tmp_path):
    p = tmp_path / "emp.csv"
    p.write_text(
        "id;name;salary;active;hired\n"
        "1;alice;1000.5;true;2024-01-01\n"
        "2;bob;2000;false;2024-02-01\n"
        "3;carol;x;true;2024-03-01\n"     # one invalid salary → still DOUBLE (≥50%)
        "4;dave;4000.25;true;2024-04-01\n"
    )
    df, types = read_csv_inferred(spark, str(p), sep=";")
    assert types == {
        "id": "INTEGER",         # pure-int column: no DOUBLE present, no absorption
                                 # (DataTypeOccurences.java:59-63 — conditional)
        "name": "STRING",
        "salary": "DOUBLE",
        "active": "BOOLEAN",
        "hired": "DATE",
    }
    row = {r["id"]: r for r in df.collect()}[1.0]
    assert row["salary"] == pytest.approx(1000.5)
    assert row["active"] is True
    assert str(row["hired"]).startswith("2024-01-01")
    # invalid value under the voted type → null after cast
    assert {r["id"]: r["salary"] for r in df.collect()}[3.0] is None


def test_standardize_exact(spark):
    df = spark.createDataFrame(
        [("BOB",), ("liz",), ("unknown",), ("robert",)], "name string"
    )
    got = [
        r["s"]
        for r in df.select(ST.standardize_expr(F.col("name"), SYNS).alias("s")).collect()
    ]
    assert got == ["Robert", "Elizabeth", "unknown", "Robert"]


def test_standardize_fuzzy(spark):
    df = spark.createDataFrame(
        [("bobb",), ("lis",), ("zzz",), ("beth",)], "name string"
    )
    out = ST.standardize_fuzzy(df, "name", SYNS, max_edits=1)
    got = {r["name"]: r["name_std"] for r in out.collect()}
    assert got["bobb"] == "Robert"      # 1 edit from 'bob'/'bobby'
    assert got["lis"] == "Elizabeth"    # 1 edit from 'liz'
    assert got["zzz"] == "zzz"          # no candidate → unchanged
    assert got["beth"] == "Elizabeth"   # exact synonym


def test_standardize_record(spark):
    df = spark.createDataFrame([("bob", "DE")], "name string, cc string")
    out = ST.standardize_record(
        df, {"name": SYNS, "cc": {"Germany": ["de", "ger"]}}
    ).collect()[0]
    assert (out["name"], out["cc"]) == ("Robert", "Germany")


def test_mask_same_class(spark):
    df = spark.createDataFrame([("Ab3 x-9",), ("Ab3 x-9",)], "v string")
    got = [r["m"] for r in df.select(ST.mask_same_class(F.col("v")).alias("m")).collect()]
    assert got[0] == got[1]                      # deterministic per value
    assert got[0][0] == "X" and got[0][1] == "x"
    assert got[0][2].isdigit() and got[0][5] == "-"
    # structure preserved, content changed for letters
    assert got[0] != "Ab3 x-9"


def test_anyorder_weight(spark):
    df = spark.createDataFrame([("john smith", "Smith john")], "a string, b string")
    r = df.select(
        anyorder_weight(F.lower(F.col("a")), F.lower(F.col("b")), "exact").alias("w"),
        anyorder_weight(F.lower(F.col("a")), F.lower(F.col("b")), "levenshtein").alias("lw"),
    ).collect()[0]
    assert r["w"] == 1.0   # same tokens, any order → exact match
    assert r["lw"] == 1.0  # sorted lower-cased forms identical
