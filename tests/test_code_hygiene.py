"""Self-enforcing scale invariants: the engine package must contain NO
row-at-a-time Python UDFs, NO driver-side collect loops, and NO RDD usage
— the three ways a Spark job silently stops being distributed. (Tests and
bench.py materialize results, which is their job; the engine itself must
only ever build plans.)"""

from __future__ import annotations

import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "flink_stream_processing_spark"

FORBIDDEN = [
    ".collect(",  # driver-side materialization inside an operator
    "F.udf(",  # row-at-a-time Python UDF
    "@udf",  # ditto (decorator form)
    ".rdd",  # RDD escape hatch
    "parallelize(",  # driver-side data distribution
    "toPandas(",  # full-table driver materialization
]


def test_engine_package_has_no_driver_side_or_row_udf_code():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        text = path.read_text()
        for pat in FORBIDDEN:
            for i, line in enumerate(text.splitlines(), 1):
                if pat in line and not line.lstrip().startswith("#"):
                    offenders.append(f"{path.relative_to(PKG.parent)}:{i}: {pat}")
    assert not offenders, "\n".join(offenders)


def test_operators_never_mutate_session_conf():
    """Operator bodies must not swap session-global SQL conf (e.g.
    ``spark.sql.shuffle.partitions``): the swap silently re-plans any
    CONCURRENT query on the shared SparkSession. Iterative loops size
    their shuffles with explicit ``repartition(numPartitions, key)``
    instead. (Streaming query wrappers may still pin state-store counts
    at ``.start()`` time — that conf is read once per query, not shared
    planning state — so the rule is scoped to operators/.)"""
    offenders = []
    for path in sorted((PKG / "operators").rglob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "conf.set(" in line and not line.lstrip().startswith("#"):
                offenders.append(f"{path.relative_to(PKG.parent)}:{i}")
    assert not offenders, "\n".join(offenders)
