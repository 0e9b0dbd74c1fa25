"""Every registered query must RUN at the smallest scale factor (sf0.001)
— tiny tables surface empty-partition, empty-group, and empty-result edge
cases (0-row buckets in LSH, single-element windows, empty join sides)
that sf0.01 correctness runs can mask. Results aren't oracle-checked here
(that's test_oracle_parity at sf0.01); the contract is: no query may
error or hang on small data."""

from __future__ import annotations

import pytest

from flink_stream_processing_spark.queries import QUERIES

from .conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_smallest_sf(spark, name):
    rows = QUERIES[name](spark, SF_SMALL).collect()
    assert rows is not None  # empty results are fine; errors are not
