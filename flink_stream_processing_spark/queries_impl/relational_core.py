"""Relational core queries (SURVEY.md §2.6 capability parity): joins,
group-aggregation, sort/limit, set ops, dedup, ranking and analytic windows,
scalar functions — all Spark built-ins on the TPC-H-ish driver tables.

Every query has a DuckDB oracle. Conventions: doubles rounded (sums to 2,
avgs/ratios to 6), counts cast to BIGINT, deterministic tiebreaks on every
order-sensitive query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import broadcast_dim_join, top_k
from ..queries import query
from ..sources.batch import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: scan -> filter -> hash agg. At 100 TB the
# shipdate filter is pushed to the parquet scan and the agg is partial+final
# (shuffle carries 6 tiny rows per partition, not data).
_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                    AS avg_qty,
       round(avg(l_extendedprice), 6)                               AS avg_price,
       round(avg(l_discount), 6)                                    AS avg_disc,
       CAST(count(*) AS BIGINT)                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping priority: broadcast(customer-filter) ⨝ orders ⨝
# lineitem, agg, top-10. Customer side post-filter is small -> broadcast;
# orders⨝lineitem shuffles on orderkey (bucketing removes it at scale).
_Q3_ORACLE = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       epoch_ms(o_orderdate) AS o_orderdate_ms,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = broadcast_dim_join(orders, cust, F.col("c_custkey") == F.col("o_custkey")).join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10).select(
        "l_orderkey",
        "revenue",
        F.unix_millis(F.col("o_orderdate")).alias("o_orderdate_ms"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# Multi-dim broadcast join chain: region ⨝ nation ⨝ customer ⨝ orders ⨝
# lineitem -> revenue per region/nation. region+nation are tiny broadcast
# dims; only the orders⨝lineitem edge shuffles.
_Q5_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM region JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY r_name, n_name
"""


@query("q5_region_revenue", oracle=_Q5_ORACLE)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = broadcast_dim_join(
        broadcast_dim_join(cust, nation, F.col("c_nationkey") == F.col("n_nationkey")),
        region,
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    joined = orders.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey")).join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Top-k (TakeOrderedAndProject — no global sort).
_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("top_k_orders", oracle=_TOPK_ORACLE)
def q_top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k(
        _t(spark, sf_dir, "orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        20,
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------------------
# Aggregate statistics battery (count/sum/avg/min/max/stddev/var).
_STATS_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT)          AS cnt,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       round(sum(o_totalprice), 2)       AS sum_price,
       round(avg(o_totalprice), 6)       AS avg_price,
       min(o_totalprice)                 AS min_price,
       max(o_totalprice)                 AS max_price,
       round(stddev_samp(o_totalprice), 6) AS stddev_price
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_stats_orders", oracle=_STATS_ORACLE)
def q_agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 6).alias("stddev_price"),
        )
    )


# ---------------------------------------------------------------------------
# Ranking window: top-3 customers by balance per market segment.
_RANK_ORACLE = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer
) WHERE rnk <= 3
"""


@query("ranking_top3_per_segment", oracle=_RANK_ORACLE)
def q_ranking_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


# ---------------------------------------------------------------------------
# Analytic window battery: lag + cumulative sum per customer order history.
# Cumulative FP sums are order-identical on both engines given the same
# ORDER BY (sequential scan within partition).
_ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
FROM orders
"""


@query("analytic_running_totals", oracle=_ANALYTIC_ORACLE)
def q_analytic_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
        .alias("running_total"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# Set operations over customer key sets (orders in each status).
_SETOPS_ORACLE = """
WITH o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT o_custkey FROM o UNION SELECT o_custkey FROM f)
UNION ALL
SELECT 'intersect', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM o INTERSECT SELECT o_custkey FROM f)
UNION ALL
SELECT 'except', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)
"""


@query("set_ops_customers", oracle=_SETOPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    spark_union = o.union(f).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    spark_intersect = o.intersect(f).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    spark_except = o.exceptAll(f.distinct()).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return spark_union.unionAll(spark_intersect).unionAll(spark_except)


# ---------------------------------------------------------------------------
# Anti join (customers with no orders) + left join with zero-fill.
_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("anti_join_customers_no_orders", oracle=_ANTI_ORACLE)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_LEFTJOIN_ORACLE = """
SELECT c_custkey,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


@query("left_join_order_counts", oracle=_LEFTJOIN_ORACLE)
def q_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# ROLLUP grouping sets.
_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_lineitem", oracle=_ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation in the oracle).
_PIVOT_ORACLE = """
SELECT l_linestatus,
       round(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0.0), 2) AS A,
       round(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0.0), 2) AS N,
       round(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0.0), 2) AS R
FROM lineitem
GROUP BY l_linestatus
"""


@query("pivot_returnflag", oracle=_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_linestatus",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("A", "N", "R")],
    )


# ---------------------------------------------------------------------------
# Scalar function battery — strings & math (part), dates (orders).
_SCALAR_STR_ORACLE = """
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       CAST(length(p_name) AS INTEGER)                 AS name_len,
       substr(p_type, 1, 5)                            AS type_prefix,
       p_brand || '/' || p_type                        AS brand_type,
       CAST(p_size % 7 AS INTEGER)                     AS size_mod7,
       CAST(abs(p_size - 25) AS INTEGER)               AS size_dist,
       round(ln(p_retailprice + 1), 6)                 AS log_price,
       round(sqrt(p_retailprice), 6)                   AS sqrt_price,
       CAST(floor(p_retailprice / 100) AS BIGINT)      AS price_bucket,
       replace(lower(p_brand), 'brand', 'b')           AS brand_short
FROM part
"""


@query("scalar_string_math", oracle=_SCALAR_STR_ORACLE)
def q_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 7).cast("int").alias("size_mod7"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
        F.replace(F.lower(F.col("p_brand")), F.lit("brand"), F.lit("b")).alias("brand_short"),
    )


_SCALAR_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)      AS o_year,
       CAST(month(o_orderdate) AS INTEGER)     AS o_month,
       CAST(day(o_orderdate) AS INTEGER)       AS o_day,
       CAST(quarter(o_orderdate) AS INTEGER)   AS o_quarter,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start,
       strftime(o_orderdate, '%Y-%m-%d')       AS iso_date
FROM orders
"""


@query("scalar_dates", oracle=_SCALAR_DATE_ORACLE)
def q_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.quarter("o_orderdate").cast("int").alias("o_quarter"),
        F.unix_millis(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start_ms"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


# ---------------------------------------------------------------------------
# Semi join + HAVING: big-spender customers in one segment.
_HAVING_ORACLE = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS spend
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_custkey
HAVING count(*) >= 5
"""


@query("semi_join_having", oracle=_HAVING_ORACLE)
def q_semi_join_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 5)
    )
