"""Capability-parity relational core (SURVEY.md §2.6).

The reference has no joins/sorts/set-ops/ranking — these are the additions
that make the engine usable as a query engine on real tables, implemented
100 % with Spark built-ins so Catalyst owns the physical strategy.

Scale notes (100 TB):
- Dimension joins (region/nation/customer-sized sides) use ``broadcast()``
  hints — no shuffle of the fact table; Spark's AQE will also convert
  sort-merge to broadcast at runtime when a side turns out small.
- Fact-fact joins (orders x lineitem) shuffle on the join key; at scale,
  bucketing both tables on the key (``writeTo.bucketBy``) removes the
  shuffle — helper ``bucketed_write`` below documents the pattern.
- Top-k is ``orderBy().limit(k)`` which Spark executes as TakeOrderedAndProject
  (per-partition heap + driver merge of k rows) — never a full sort.
- Skew: AQE skew-join splitting is enabled in session.py; ``salted_join``
  provides explicit salting when a key's row share is pathological.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner") -> DataFrame:
    """Equi-join with an explicit broadcast of the dimension side."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Top-k: Catalyst plans TakeOrderedAndProject — O(k) memory/partition,
    no global shuffle-sort. Callers must include a unique tiebreak column
    for deterministic output."""
    return df.orderBy(*order).limit(k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: explode the (small) right side across
    ``salt_buckets`` salt values and scatter the left side randomly-but-
    deterministically (hash of whole row), so one hot key no longer lands in
    a single shuffle partition. Use when AQE's skew splitting isn't enough
    (e.g. a single key holding >5 % of a 100 TB fact table).
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_left.join(salted_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def bucketed_write(df: DataFrame, table: str, key: str, buckets: int, path: str) -> None:
    """Persist a fact table bucketed on its join key: future joins between
    tables bucketed the same way need no shuffle (co-located join). This is
    the 100 TB answer to repeated orders-lineitem joins."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def partitioned_write(df: DataFrame, partition_col: str, path: str) -> None:
    """Persist a table hive-partitioned on a low-cardinality column: queries
    filtering on it prune whole directories at planning time (zero I/O for
    excluded partitions) — the first-line layout decision at 100 TB. Keep
    partition columns low-cardinality (date, type, tenant); high-cardinality
    partitioning produces millions of tiny files instead."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def compact_table(spark, path: str, out_path: str, target_files: int) -> None:
    """Small-file compaction — the nightly maintenance op of any long-lived
    100 TB table (streaming sinks and incremental loads accrete thousands
    of small files; scan planning cost and open-per-file overhead grow
    linearly with file count). Rewrites the table into ``target_files``
    files via coalesce (no shuffle: existing partitions are merged)."""
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(out_path)


def clustered_write(df: DataFrame, cols: list[str], path: str, n_files: int) -> None:
    """Cluster-on-write: range-repartition on ``cols`` then sort within
    partitions, so each output file covers a NARROW range of the cluster
    key and parquet row-group min/max stats skip whole files for point and
    range predicates — the poor man's Z-order, and the layout lever that
    complements hive partitioning (partition on low-cardinality columns,
    cluster on high-cardinality ones)."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
