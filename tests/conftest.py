import pytest

from ocr_machine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="ocr-machine-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
