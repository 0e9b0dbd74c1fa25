"""Physical-layout regression: bucketed tables must join WITHOUT a shuffle
(the co-located-join story the 100 TB design rests on)."""

from __future__ import annotations

import uuid

from flink_stream_processing_spark.plans import formatted_plan
from flink_stream_processing_spark.sources.batch import load_table
from flink_stream_processing_spark.sources.bucketed import write_bucketed

from .conftest import SF_SMALL


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        write_bucketed(orders, t_orders, "o_orderkey", 8, str(tmp_path / "o"))
        write_bucketed(lineitem, t_lineitem, "l_orderkey", 8, str(tmp_path / "l"))

        # force the sort-merge path (broadcast would hide the exchange
        # question for these small test tables)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            o = spark.table(t_orders)
            li = spark.table(t_lineitem)
            joined = o.join(li, o.o_orderkey == li.l_orderkey)
            plan = formatted_plan(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan

            # control: the same join on the unbucketed parquet MUST shuffle
            control = orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            assert "Exchange" in formatted_plan(control)

            # and the result is the same either way
            assert joined.count() == control.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
