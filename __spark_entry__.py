"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's windowed metrics
aggregate, SURVEY.md §2.5) on sf0.001. ``queries()`` maps every implemented
operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the correctness gate.
Column names/aliases match between both sides (driver hash-compares after
sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_stream_processing_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.QUERIES["window_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
