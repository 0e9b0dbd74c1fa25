"""Differential test: every registered query vs its DuckDB oracle at sf0.01
(the same gate the driver runs). Queries without an oracle get a rows-run
smoke check."""

from __future__ import annotations

import pytest

from flink_stream_processing_spark.queries import ORACLE_SQL, QUERIES

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE_SQL:
        assert_matches_oracle(df, ORACLE_SQL[name], SF_DIR)
    else:
        assert df.count() >= 0  # rows-only smoke: runs and has stable schema
        assert len(df.schema.fields) > 0
