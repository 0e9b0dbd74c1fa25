"""Scan-parallelism guard for fanout-heavy map stages.

The driver's test tables are single-file, SINGLE-ROW-GROUP parquet, so every
scan is one task no matter what ``spark.sql.files.*`` says (a parquet split
cannot be narrower than a row group). Everything map-side before the first
exchange — tokenization, window hashing, shingle construction, signature
folds, Python batch UDFs — therefore ran on ONE core at bench scale
(measured r19: 3-5 s single-task stages behind `AQEShuffleRead coalesced`
or 1-split scans, across the fuzzy/dedup/span/text families).

``spread_fanout`` is the guide §2.5 fix ("input skew: one huge unsplittable
file — repartition immediately after the read"), made SCALE-ADAPTIVE: it
re-spreads only when the relation's current parallelism is below the
session's core count, so on a real cluster (thousands of input splits, AQE
post-shuffle partitioning sized to data volume) it is a plan no-op — the
exchange only appears where the input genuinely under-parallelizes the
downstream per-row work. The exchange it inserts moves the narrow input
relation once; the stages it parallelizes do O(fanout) work per row, which
is why the trade wins whenever it fires.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_fanout(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin ``df`` across the session's parallelism IF its current
    partitioning is narrower — identity otherwise. Row-multiset preserved
    (round-robin repartition re-buckets rows, never drops/dups them); only
    safe above order-insensitive consumers, which every caller here is
    (hash/count/min aggregates, per-row projections)."""
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):  # measurement kill-switch
        return df
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= goal:
        return df
    return df.repartition(goal)
