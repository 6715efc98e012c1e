"""Luhn card PII: known-vector checks and the expression/SQL twins."""

import duckdb
from pyspark.sql import functions as F

from data_quality_spark.functions.pii import (
    luhn_check_digit,
    luhn_check_digit_sql,
    luhn_valid,
    luhn_valid_sql,
    scrub_valid_cards,
)


def _py_luhn_ok(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return 13 <= len(s) <= 19 and total % 10 == 0


KNOWN_VALID = ["4111111111111111", "5500005555555559", "340000000000009", "30000000000004"]
KNOWN_INVALID = ["4111111111111112", "1234567812345678", "0000000000001"]


def test_known_vectors_spark(spark):
    rows = [(c,) for c in KNOWN_VALID + KNOWN_INVALID]
    df = spark.createDataFrame(rows, ["c"])
    got = {r["c"]: r["ok"] for r in df.select("c", luhn_valid(F.col("c")).alias("ok")).collect()}
    for c in KNOWN_VALID:
        assert got[c] and _py_luhn_ok(c), c
    for c in KNOWN_INVALID:
        assert not got[c] and not _py_luhn_ok(c), c


def test_check_digit_roundtrip(spark):
    bases = ["411111111111111", "550000555555555", "01234567890123"]
    df = spark.createDataFrame([(b,) for b in bases], ["b"])
    out = df.select(
        F.concat(F.col("b"), luhn_check_digit(F.col("b")).cast("string")).alias("full")
    )
    for r in out.collect():
        assert _py_luhn_ok(r["full"]), r["full"]


def test_sql_twins_match_python():
    con = duckdb.connect()
    for c in KNOWN_VALID + KNOWN_INVALID:
        lit = "'" + c + "'"
        (ok,) = con.execute(f"SELECT {luhn_valid_sql(lit)}").fetchone()
        assert ok == _py_luhn_ok(c), c
    for b in ["411111111111111", "01234567890123"]:
        lit = "'" + b + "'"
        (d,) = con.execute(f"SELECT {luhn_check_digit_sql(lit)}").fetchone()
        assert _py_luhn_ok(b + str(d))


def test_scrub_masks_only_valid(spark):
    text = "pay 4111-1111-1111-1111 ref 4111111111111112 ok"
    df = spark.createDataFrame([(text,)], ["t"])
    (got,) = df.select(scrub_valid_cards(F.col("t")).alias("s")).collect()[0]
    assert got == "pay <CARD> ref 4111111111111112 ok"


def test_valid_card_inside_longer_run_not_masked(spark):
    # a 20-digit serial whose first 16 digits pass Luhn is NOT a
    # candidate and must survive untouched (boundary-anchored replace)
    text = "id 41111111111111110000 pay 4111111111111111 end"
    df = spark.createDataFrame([(text,)], ["t"])
    (got,) = df.select(scrub_valid_cards(F.col("t")).alias("s")).collect()[0]
    assert got == "id 41111111111111110000 pay <CARD> end"


def test_email_ip_scrub_vectors(spark):
    from pyspark.sql import functions as F

    from data_quality_spark.functions.pii import (
        count_emails,
        count_ipv4,
        scrub_emails,
        scrub_ipv4,
    )

    cases = [
        ("mail a.b+c@x.example.org now", "mail <EMAIL> now", 1, 0),
        ("at 10.0.0.1 and 255.255.255.255", "at <IP> and <IP>", 0, 2),
        # octet validation: 999 is not an IPv4 octet
        ("bad 999.1.1.1 stays", "bad 999.1.1.1 stays", 0, 0),
        # documented conservative bias: 5-part dotted runs mask the
        # first four octets
        ("ver 1.2.3.4.5", "ver <IP>.5", 0, 1),
        ("no pii here", "no pii here", 0, 0),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in cases], ["t"])
    got = df.select(
        scrub_ipv4(scrub_emails(F.col("t"))).alias("s"),
        count_emails(F.col("t")).alias("e"),
        count_ipv4(F.col("t")).alias("i"),
    ).collect()
    for r, (_, exp_s, exp_e, exp_i) in zip(got, cases):
        assert (r["s"], r["e"], r["i"]) == (exp_s, exp_e, exp_i)
