import os

import pytest

from pyspark_unload_to_gcs_spark.session import get_spark

SF0001 = os.environ.get("SPARK_GRAFT_SF0001", "/root/testdata/sf0.001")
SF001 = os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pyspark-unload-to-gcs-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001


@pytest.fixture(scope="session")
def sf_dir_mid() -> str:
    return SF001
