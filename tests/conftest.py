import pytest

from subont.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("subont-tests", cores=8, shuffle_partitions=4)
    yield s
    s.stop()
