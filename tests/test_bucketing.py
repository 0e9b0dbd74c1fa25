"""Physical-layout regression: bucketed tables must join WITHOUT a shuffle
(the co-located-join story the 100 TB design rests on)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.relational import bucketed_write, salted_join
from flink_stream_processing_spark.plans import formatted_plan
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_SMALL


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        bucketed_write(orders, t_orders, "o_orderkey", 8, str(tmp_path / "o"))
        bucketed_write(lineitem, t_lineitem, "l_orderkey", 8, str(tmp_path / "l"))

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


def test_salted_join_matches_plain_join(spark):
    """salted_join must produce exactly the plain join's rows while
    scattering each key across salt buckets (the skew-mitigation contract).
    Includes a pathological hot key holding most of the left side."""
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)] + [(3, 0)],
        "k long, payload long",
    )
    right = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unmatched")], "k long, label string")

    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt_buckets=8)

    assert sorted(tuple(r) for r in salted.select("k", "payload", "label").collect()) == \
           sorted(tuple(r) for r in plain.select("k", "payload", "label").collect())

    # the hot key's rows really are spread over multiple salt buckets
    from pyspark.sql import functions as F

    n_buckets = (
        left.filter(F.col("k") == 1)
        .withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (planning-time directory pruning), not a data filter: the pruned scan
    reads 1 of 5 partitions and zero row-group I/O elsewhere."""
    from flink_stream_processing_spark.operators.relational import partitioned_write
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    partitioned_write(ev, "event_type", path)

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1][:200]
    n = back.count()
    expect = ev.filter(F.col("event_type") == "click").count()
    assert n == expect and n > 0


def test_compact_table_reduces_file_count(spark, tmp_path):
    from flink_stream_processing_spark.operators.relational import compact_table
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_SMALL

    frag = str(tmp_path / "fragmented")
    ev = load_table(spark, SF_SMALL, "events")
    ev.repartition(37).write.parquet(frag)
    out = str(tmp_path / "compacted")
    compact_table(spark, frag, out, 4)
    import glob

    assert len(glob.glob(out + "/part-*.parquet")) <= 4
    assert spark.read.parquet(out).count() == ev.count()


def test_clustered_write_gives_disjoint_file_ranges(spark, tmp_path):
    """Each clustered file must cover a narrow, non-overlapping user_id
    range (that's what lets row-group stats skip whole files); a plain
    hash-partitioned write would give every file the full id range."""
    import glob

    import pyarrow.parquet as pq

    from flink_stream_processing_spark.operators.relational import clustered_write
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    path = str(tmp_path / "clustered")
    clustered_write(ev, ["user_id"], path, 8)
    ranges = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.read_metadata(f)
        col = md.row_group(0).column(0)
        mn = min(md.row_group(g).column(0).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(0).statistics.max for g in range(md.num_row_groups))
        ranges.append((mn, mx))
    ranges.sort()
    assert len(ranges) >= 4
    # ranges must be (near-)disjoint: each file's max <= next file's min
    # (range partitioning puts boundary keys in exactly one file)
    for (m1, x1), (m2, x2) in zip(ranges, ranges[1:]):
        assert x1 <= m2, (ranges,)
    # and a point filter over the clustered table is pushed to the scan
    q = spark.read.parquet(path).filter(F.col("user_id") == ranges[0][0])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id" in plan
