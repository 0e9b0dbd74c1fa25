"""Bucketed-table write/read: the co-located-join primitive for 100 TB.

Writing both sides of a hot join bucketed (and sorted) by the join key
means every future equi-join on that key is Exchange-free: Spark trusts the
bucket layout as a pre-existing hash partitioning, so the sort-merge join
reads matching buckets side by side with NO shuffle stage. On a petabyte
fact table this converts the dominant cost of the join (full re-shuffle of
both inputs) into a pure scan — the single highest-leverage physical-layout
decision a Spark warehouse makes. Verified by plan assertion in
``tests/test_bucketing.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) table keyed on
    ``key``. ``path`` makes it external (tests); omit for the warehouse."""
    w = df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
