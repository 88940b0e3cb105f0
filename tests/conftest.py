import pytest

from davar_lab_ocr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("davar-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
