from __future__ import annotations

import pytest

from flink_stream_processing_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias usable inside hypothesis @given tests (function-scoped fixtures
    are rejected there; this one is session-scoped)."""
    return spark
