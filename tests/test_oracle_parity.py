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


def test_contract_outputs_are_scalar(spark):
    """The driver canonicalizer hashes scalar cells only: no query may emit
    array/map/struct columns (project through array_join/to_json instead).
    Round-1 regression: 4 queries ERR'd on array outputs."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        for field in df.schema.fields:
            assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
                f"{name}.{field.name} is {field.dataType.simpleString()}"
            )
