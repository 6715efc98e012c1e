"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality pipeline on sf0.001;
`queries()` / `oracle_sql()` expose each implemented operator from
SURVEY.md §2 with its DuckDB oracle twin (see data_quality_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_quality_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["quality_pipeline_docs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (UDF-backed queries are rows-only)."""
    return dict(ORACLES)
