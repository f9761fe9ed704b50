import pytest

from nyctaxidatapipeline_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small master: tiny in-memory frames schedule faster on 4 threads
    # than 32 (per-task overhead dominates at test scale).
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
