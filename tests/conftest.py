import pytest

from spype_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spype-tests", master="local[2]", shuffle_partitions=2)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
