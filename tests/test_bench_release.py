"""Pins the bench harness's per-query checkpoint-release mechanism
(bench.py:release_checkpoints), answering the r7 verdict's open question:
do eager ``localCheckpoint`` blocks (the d2 fuzzy join's staging,
operators/text.py) actually get freed between timed queries, or do they
leak and pressure storage memory for every later query (the suspected
cause of the map_hof_battery 12.4 s driver-run outlier)?

Probed result: localCheckpoint blocks ARE visible in
``getPersistentRDDs`` and ``unpersist`` frees their block-manager memory
— the leak hypothesis is DISPROVEN. The 12.4 s observation is
environment-side variance (the same commit measured 3.08 s in the
builder's run of the identical bench); BENCH_BUDGET.json is recalibrated
from the union of builder and driver run history instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _persistent_ids(spark) -> set[int]:
    ids: set[int] = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(int(it.next()._1()))
    return ids


def _storage_mem_used(spark) -> int:
    jvm = spark.sparkContext._jvm
    statuses = (
        jvm.org.apache.spark.SparkEnv.get().blockManager().master().getStorageStatus()
    )
    return sum(s.memUsed() for s in statuses)


def test_local_checkpoint_blocks_are_released(spark):
    """The exact sequence bench.py runs per query: snapshot persistent-RDD
    ids, run a query that eagerly localCheckpoints (as the d2 fuzzy join
    does), then blocking-unpersist every id created by the query. The
    blocks must (a) be visible to the snapshot mechanism while live and
    (b) leave no storage-memory residue after release."""
    before_ids = _persistent_ids(spark)
    base_mem = _storage_mem_used(spark)

    ck = (
        spark.range(0, 200_000)
        .select(F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("s"))
        .localCheckpoint(eager=True)
    )
    assert ck.count() == 200_000

    live_ids = _persistent_ids(spark)
    created = live_ids - before_ids
    assert created, "localCheckpoint block invisible to getPersistentRDDs"
    assert _storage_mem_used(spark) > base_mem, "checkpoint used no storage"

    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        e = it.next()
        if int(e._1()) in created:
            e._2().unpersist(True)  # blocking, as bench.py now does

    assert _persistent_ids(spark) == before_ids
    # Blocking unpersist => memory is back to (near) baseline immediately;
    # allow a small slack for unrelated broadcast residue.
    assert _storage_mem_used(spark) <= base_mem + 1_000_000
