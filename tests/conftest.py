import pytest

from calendar_event_entity_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cees-tests", cores=8, shuffle_partitions=8)
    yield s
