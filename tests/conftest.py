import os

import pytest

from astro_sdk_spark import SparkEngine, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="astro_sdk_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def engine(spark):
    return SparkEngine(spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
