"""Scan-parallelism guard for fanout-heavy map stages.

The driver's test tables are single-file, SINGLE-ROW-GROUP parquet, so every
scan is one task no matter what ``spark.sql.files.*`` says (a parquet split
cannot be narrower than a row group). Everything map-side before the first
exchange — tokenization, window hashing, shingle construction, signature
folds — therefore ran on ONE core at bench scale (measured r19: 3-5 s
single-task stages behind `AQEShuffleRead coalesced` or 1-split scans,
across the fuzzy/dedup/span families).

``spread_fanout`` is the guide §2.5 fix ("input skew: one huge unsplittable
file — repartition immediately after the read"), made SCALE-ADAPTIVE via
the optimizer's own size statistics (the same estimates broadcast planning
uses): a relation is re-spread only when its estimated bytes are below one
scan-split per session core — i.e. when its scan parallelism CANNOT reach
the core count. On a real cluster the corpus-scale inputs these operators
see are orders of magnitude past that bound, so the exchange never appears;
where it does fire, it moves the narrow input relation once while the
stages it parallelizes do O(fanout) hash/serde work per row — the trade
that wins whenever it fires (and loses for plain tokenize/aggregate inputs,
which is why call sites are curated per the r19 kill-switch A/Bs rather
than blanket).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _estimated_bytes(df: DataFrame):
    """Optimizer size estimate of the relation (logical-plan statistics —
    no execution, the same numbers auto-broadcast thresholds read).
    None when unavailable (e.g. streaming plans)."""
    try:
        # py4j maps the Scala BigInt to a Python int; str() also covers the
        # JavaObject case so the conversion is version-proof.
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None


def _spread_cap_bytes() -> int:
    """Absolute ceiling on the re-spread gate (r19 ADVICE, medium): the
    per-core threshold ``cores x maxPartitionBytes`` grows unboundedly
    with cluster width (2000 cores -> 256 GB), so on a big cluster a
    CBO-underestimated corpus relation could be round-robin re-shuffled
    wholesale. Capping the threshold at an absolute few-GB bound means a
    stats misestimate can at worst re-shuffle a few GB — the same order a
    single join exchange moves anyway. Default 4 GiB (== the local[32]
    per-core bound, so bench behavior is unchanged); override per
    deployment via ``SPARK_GRAFT_SPREAD_MAX_BYTES``."""
    try:
        return int(os.environ.get("SPARK_GRAFT_SPREAD_MAX_BYTES", str(4 << 30)))
    except ValueError:
        return 4 << 30


def is_fanout_narrow(df: DataFrame, target: int | None = None) -> bool:
    """True when ``df``'s optimizer size estimate says its scan cannot
    reach core-count parallelism (the :func:`spread_fanout` firing
    condition): under one scan split per session core AND under the
    absolute :func:`_spread_cap_bytes` ceiling. Callers use this both to
    re-spread and as a small-regime signal (e.g. choosing a hash build
    that would not fit at corpus scale). False when stats are missing —
    at corpus scale, every default must be the scale-safe plan."""
    spark = df.sparkSession
    goal = target or spark.sparkContext.defaultParallelism
    try:
        # Canonical byte value (conf.get returns size strings like "134217728b").
        split_bytes = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:
        split_bytes = 128 * 1024 * 1024
    est = _estimated_bytes(df)
    return est is not None and est < min(goal * split_bytes, _spread_cap_bytes())


def spread_fanout(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin ``df`` across the session's parallelism IF its estimated
    size is under one scan split per core (so its scan parallelism cannot
    reach the core count) — identity otherwise. Row-multiset preserved
    (round-robin repartition re-buckets rows, never drops/dups them); only
    safe above order-insensitive consumers, which every caller here is
    (hash/count/min aggregates, per-row projections)."""
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):  # measurement kill-switch
        return df
    if not is_fanout_narrow(df, target):
        return df
    goal = target or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(goal)
