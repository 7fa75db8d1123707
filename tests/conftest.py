import os

import pytest

SF_DIR = os.environ.get("TEGOLA_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tegola_spark.plans.session import get_spark

    s = get_spark("tegola_spark_tests", cpus=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
