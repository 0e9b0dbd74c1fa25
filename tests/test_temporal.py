"""Edge-semantics tests for the as-of and interval join operators (the
oracle-parity suite covers end-to-end correctness on real data; these pin
the boundary behaviors a hash match can't isolate)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.temporal import as_of_join, interval_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _trades(spark):
    return spark.createDataFrame(
        [(1, "k1", _ts(10)), (2, "k1", _ts(20)), (3, "k1", _ts(5)), (4, "k2", _ts(10))],
        "trade_id long, key string, ts timestamp",
    )


def _quotes(spark):
    return spark.createDataFrame(
        [("k1", _ts(10), 1.0), ("k1", _ts(15), 2.0), ("k2", _ts(99), 9.0)],
        "key string, ts timestamp, px double",
    )


def test_asof_equal_timestamp_matches(spark):
    """A quote AT the trade's timestamp is 'most recent at or before'."""
    out = as_of_join(
        _trades(spark), _quotes(spark), key="key", right_value_cols=["px"], how="inner"
    )
    rows = {r.trade_id: (r.asof_ts, r.asof_px) for r in out.collect()}
    assert rows[1] == (_ts(10), 1.0)  # equal-ts tie matches
    assert rows[2] == (_ts(15), 2.0)  # strictly latest prior quote wins
    assert set(rows) == {1, 2}  # trade 3 (no prior) and trade 4 dropped


def test_asof_left_keeps_unmatched_with_nulls(spark):
    out = as_of_join(
        _trades(spark), _quotes(spark), key="key", right_value_cols=["px"], how="left"
    )
    rows = {r.trade_id: (r.asof_ts, r.asof_px) for r in out.collect()}
    assert rows[3] == (None, None)  # before any quote
    assert rows[4] == (None, None)  # k2's only quote is later
    assert len(rows) == 4


def test_asof_preserves_left_columns_and_no_range_join(spark):
    out = as_of_join(
        _trades(spark), _quotes(spark), key="key", right_value_cols=["px"], how="inner"
    )
    assert out.columns == ["trade_id", "key", "ts", "asof_ts", "asof_px"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interval_join_bounds_inclusive(spark):
    left = spark.createDataFrame([(1, "k", _ts(100))], "lid long, key string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "k", _ts(90)), (11, "k", _ts(110)), (12, "k", _ts(89)), (13, "k", _ts(111)),
         (14, "x", _ts(100))],
        "rid long, key string, ts timestamp",
    )
    out = interval_join(left, right, key="key", lower_s=10, upper_s=10)
    assert sorted(r.r_rid for r in out.collect()) == [10, 11]  # ±10 s inclusive, key-matched


def test_interval_join_asymmetric_bounds(spark):
    left = spark.createDataFrame([(1, "k", _ts(100))], "lid long, key string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "k", _ts(95)), (11, "k", _ts(130)), (12, "k", _ts(70))],
        "rid long, key string, ts timestamp",
    )
    # [ts - 5, ts + 30]
    out = interval_join(left, right, key="key", lower_s=5, upper_s=30)
    assert sorted(r.r_rid for r in out.collect()) == [10, 11]


def test_interval_join_no_duplicate_pairs_across_buckets(spark):
    """A right row landing in the bucket two exploded left copies share must
    appear exactly once per (left, right) pair."""
    left = spark.createDataFrame(
        [(i, "k", _ts(i * 7)) for i in range(30)], "lid long, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100 + i, "k", _ts(i * 11)) for i in range(20)], "rid long, key string, ts timestamp"
    )
    out = interval_join(left, right, key="key", lower_s=13, upper_s=13)
    pairs = [(r.l_lid, r.r_rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # brute-force reference
    lrows = {r.lid: r.ts for r in left.collect()}
    rrows = {r.rid: r.ts for r in right.collect()}
    expect = {
        (li, ri)
        for li, lt in lrows.items()
        for ri, rt in rrows.items()
        if lt - dt.timedelta(seconds=13) <= rt <= lt + dt.timedelta(seconds=13)
    }
    assert set(pairs) == expect
