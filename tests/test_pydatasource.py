"""Custom Python data source (Spark 4 pluggable-connector API): split
planning and exactness (the value-level gate is the registry oracle)."""

from __future__ import annotations

from flink_stream_processing_spark.sources.pydatasource import (
    TxnGenDataSource,
    _TxnReader,
    synthesize,
)


def test_split_planning_covers_range_disjointly():
    r = _TxnReader({"rows": "1003", "partitions": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    seen = []
    for p in parts:
        seen.extend(range(p.start, p.end))
    assert seen == list(range(1003))  # disjoint, ordered, complete


def test_reference_poison_semantics():
    # CNY rows carry exchange_rate 0.0 (RemittanceGenerator.java:49)
    rows = [synthesize(i) for i in range(2000)]
    cny = [r for r in rows if r[2] == "CNY"]
    assert cny and all(r[3] == 0.0 for r in cny)
    assert all(r[3] > 0 for r in rows if r[2] != "CNY")


def test_read_through_spark(spark):
    spark.dataSource.register(TxnGenDataSource)
    df = (
        spark.read.format("txn_gen")
        .option("rows", "100")
        .option("partitions", "3")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    got = sorted((r.txn_id, r.currency) for r in df.collect())
    assert got == sorted((i, synthesize(i)[2]) for i in range(100))


def test_reader_rejects_bad_options(spark):
    import pytest

    from flink_stream_processing_spark.sources.pydatasource import register

    register(spark)
    with pytest.raises(Exception, match="partitions must be"):
        spark.read.format("txn_gen").option("partitions", 0).load().collect()
    # rows=0 is a legal EMPTY scan, not a crash
    assert spark.read.format("txn_gen").option("rows", 0).load().count() == 0
