"""Every queries() entry with an oracle must match it exactly at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

import pytest

from data_quality_spark.queries import ORACLES, QUERIES

from .parity import compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name):
    problems = compare(spark, name, QUERIES[name], ORACLES[name], SF_DIR)
    assert not problems, problems


def test_rows_only_queries_run(spark):
    """UDF-backed queries (no oracle) must still run and return rows."""
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
