import pytest


@pytest.fixture(scope="session")
def spark():
    from data_quality_spark.session import get_spark

    s = get_spark(app_name="dqs-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
