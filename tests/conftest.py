import pytest


@pytest.fixture(scope="session")
def spark():
    from doc_ocr_spark.session import get_spark

    s = get_spark("doc_ocr_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
