"""Additional relational-core queries: TPC-H Q6/Q10 analogues, exact
interpolated percentiles, a second scalar-string battery, and conditional
aggregation patterns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# TPC-H Q6: pure filter + scalar aggregate — the pushdown showcase (every
# predicate reaches the parquet scan; the agg is a single partial+final sum).
_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# TPC-H Q10 analogue: returned-item revenue per customer, top 20.
_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN nation   ON c_nationkey = n_nationkey
              JOIN orders   ON o_custkey = c_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", oracle=_Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# Exact interpolated percentiles (Spark percentile == DuckDB quantile_cont).
_PCT_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@query("percentiles_orders", oracle=_PCT_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        )
    )


# Scalar string battery 2: regexp extraction, padding, slicing, search.
_STR2_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_type, '^[A-Z]+', 0)   AS type_word,
       lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
       reverse(p_brand)                        AS brand_rev,
       left(p_name, 8)                         AS name_left8,
       right(p_name, 4)                        AS name_right4,
       CAST(instr(p_name, 'a') AS INTEGER)     AS first_a,
       translate(p_brand, 'Bd#', 'bD_')        AS brand_translated,
       split_part(p_type, ' ', 1)              AS type_first_word,
       repeat(p_brand, 2)                      AS brand_twice
FROM part
"""


@query("scalar_strings_2", oracle=_STR2_ORACLE)
def q_scalar_strings_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), "^[A-Z]+", 0).alias("type_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.substring(F.col("p_name"), 1, 8).alias("name_left8"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("name_right4"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
        F.translate(F.col("p_brand"), "Bd#", "bD_").alias("brand_translated"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
    )


# Conditional aggregation battery (count_if / sum of CASE / filtered avg).
_COND_ORACLE = """
SELECT c_mktsegment,
       CAST(count(*) FILTER (WHERE c_acctbal > 0) AS BIGINT)  AS n_positive,
       CAST(count(*) FILTER (WHERE c_acctbal <= 0) AS BIGINT) AS n_nonpositive,
       round(coalesce(avg(c_acctbal) FILTER (WHERE c_acctbal > 0), 0.0), 6) AS avg_positive,
       round(sum(CASE WHEN c_acctbal > 5000 THEN c_acctbal ELSE 0 END), 2) AS rich_total
FROM customer
GROUP BY c_mktsegment
"""


@query("conditional_agg_customers", oracle=_COND_ORACLE)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("c_acctbal")
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count_if(c > 0).alias("n_positive"),
            F.count_if(c <= 0).alias("n_nonpositive"),
            F.round(F.coalesce(F.avg(F.when(c > 0, c)), F.lit(0.0)), 6).alias("avg_positive"),
            F.round(F.sum(F.when(c > 5000, c).otherwise(0.0)), 2).alias("rich_total"),
        )
    )
