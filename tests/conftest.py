import pytest


@pytest.fixture(scope="session")
def spark():
    from receipt_scanner_spark.plans.session import get_spark

    s = get_spark(app_name="pytest-rss", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
