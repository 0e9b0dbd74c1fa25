"""Physical-plan regression tests: the properties that make the queries
scale (pushdown, pruning, broadcast, top-k heap) must stay in the plan."""

from __future__ import annotations

from flink_stream_processing_spark.plans import (
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
)
from flink_stream_processing_spark.plans.inspect import read_schema_columns
from flink_stream_processing_spark.queries import QUERIES

from .conftest import SF_DIR


def test_q1_filter_pushed_to_scan(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert has_pushed_filter(df, "l_shipdate")


def test_q1_column_pruning(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    cols = read_schema_columns(df)
    # 7 of lineitem's 11 columns are needed; the scan must not read the rest
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_q3_broadcasts_dims_and_uses_topk_heap(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF_DIR)
    assert has_broadcast_join(df)
    assert has_take_ordered(df)
    assert has_pushed_filter(df, "c_mktsegment")
    assert has_pushed_filter(df, "o_orderdate")


def test_q5_broadcasts_dimension_chain(spark):
    assert has_broadcast_join(QUERIES["q5_region_revenue"](spark, SF_DIR))


def test_top_k_orders_never_global_sorts(spark):
    from flink_stream_processing_spark.plans import formatted_plan

    df = QUERIES["top_k_orders"](spark, SF_DIR)
    assert has_take_ordered(df)
    # top-k must be the per-partition heap only — no standalone global Sort
    # node may appear in the physical plan.
    plan = formatted_plan(df)
    assert "Sort [" not in plan and "(Sort" not in plan, plan


def test_semi_join_stays_semi(spark):
    from flink_stream_processing_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["semi_join_having"](spark, SF_DIR))
    assert "LeftSemi" in plan
