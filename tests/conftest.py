import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    from hawaiidatapipeline_spark.session import get_spark

    s = get_spark(app_name="hdp-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF0001 = "/root/testdata/sf0.001"
