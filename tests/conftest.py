import os

import pytest

SF_UNIT = "/root/testdata/sf0.001"
SF_TEST = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from q_digest_spark.plans.session import get_spark

    s = get_spark("q_digest_spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_unit():
    return SF_UNIT


@pytest.fixture(scope="session")
def sf_test():
    return SF_TEST
