import pytest

from awi_datapipelinepublic_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("awi-dp-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
