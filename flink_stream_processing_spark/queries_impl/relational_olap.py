"""OLAP grouping queries (cube, grouping sets) and approximate aggregates
(HyperLogLog distinct, approximate percentiles) with bound-checked oracles.

Approximate aggregates can't hash-match an exact oracle by definition, so
their queries output (a) the exact value, computed alongside, and (b) a
BOOLEAN asserting the approximate result landed within its documented error
bound. The oracle computes the same exact value and a literal TRUE — so a
CORRECTNESS hash match certifies the sketch actually ran and met its bound,
rather than leaving the query rows-only. (The sketches matter at 100 TB:
approx_count_distinct is a fixed-size HLL merge instead of a distinct
shuffle, approx_percentile a mergeable KLL-style sketch instead of a global
sort.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# Cube over (status, priority) with grouping_id — all 4 grouping combos in
# one pass (Spark plans Expand + single aggregate, not 4 scans). Spark's
# grouping_id() and DuckDB's GROUPING() use the same bit order (first listed
# column = MSB), verified empirically.
_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_order_stats", oracle=_CUBE_ORACLE)
def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "cnt", "total")
    )


# Explicit GROUPING SETS — the general form (cube/rollup are special cases);
# exercised through the SQL surface since that's where the clause lives.
_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


@query("grouping_sets_revenue", oracle=_GSETS_ORACLE)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        """
    )


# HyperLogLog distinct counts, bound-checked: Spark's approx_count_distinct
# at rsd=0.02 (2% relative standard deviation); the query asserts the
# estimate is within 5% (2.5 sigma) of the exact distinct computed in the
# same pass. Output = exact value + the assertion bit, both reproducible by
# the oracle.
_APPROX_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS hll_within_5pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("approx_distinct_bounds", oracle=_APPROX_DISTINCT_ORACLE)
def q_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r19: the distinct-pair merge exchange is AQE-coalesced by its BYTE
    # size (2.75 MB of partial sketches -> 2 post-shuffle partitions), but
    # the merge cost is per-pair HLL/dedup CPU (profiled 1.6 s on 2 tasks at
    # sf0.1). An explicit (group, distinct-key) repartition pins the merge
    # width to the core count — scale-adaptive via defaultParallelism, and
    # at corpus scale a distinct-agg's exchange is unavoidable anyway
    # (partial agg barely shrinks high-cardinality distinct pairs).
    # Rotated A/B at sf0.1: 2.24 s base vs 1.40 s pinned; results equal.
    par = spark.sparkContext.defaultParallelism
    return (
        _t(spark, sf_dir, "orders")
        .repartition(par, "o_orderpriority", "o_custkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("hll"),
        )
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("hll") - F.col("exact_custs"))
                <= 0.05 * F.col("exact_custs")
            ).alias("hll_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


# Approximate percentiles, bound-checked by RANK: approx_percentile(0.5,
# accuracy=10000) guarantees rank error <= n/10000, which is dominated by
# the exact p45..p55 value envelope at these group sizes. The query outputs
# the exact interpolated median and the envelope assertion.
_APPROX_PCT_ORACLE = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 4) AS exact_p50,
       TRUE AS approx_within_decile
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("approx_quantile_bounds", oracle=_APPROX_PCT_ORACLE)
def q_approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("exact_p50"),
            F.approx_percentile("c_acctbal", F.lit(0.5), F.lit(10000)).alias("ap50"),
            F.percentile("c_acctbal", F.lit(0.45)).alias("p45"),
            F.percentile("c_acctbal", F.lit(0.55)).alias("p55"),
        )
        .select(
            "c_mktsegment",
            "exact_p50",
            (
                (F.col("ap50") >= F.col("p45")) & (F.col("ap50") <= F.col("p55"))
            ).alias("approx_within_decile"),
        )
        .orderBy("c_mktsegment")
    )


# Second analytic-window battery: distribution functions (ntile,
# percent_rank, cume_dist) and positional window values (first/last/nth) —
# one shuffle on the partition key, computed in a single Window operator.
_ANALYTIC2_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       CAST(ntile(4) OVER w AS BIGINT)            AS price_quartile,
       round(percent_rank() OVER w, 6)            AS pct_rank,
       round(cume_dist() OVER w, 6)               AS cum_dist,
       round(first_value(o_totalprice) OVER w, 2) AS cheapest,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
QUALIFY o_orderkey % 10 = 0
ORDER BY o_orderkey
"""


@query("analytic_distribution_windows", oracle=_ANALYTIC2_ORACLE)
def q_analytic_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("long").alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
            F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_cheapest"),
        )
        # window computed over ALL rows; the 1-in-10 projection only trims
        # the transferred result (the oracle QUALIFYs identically)
        .filter(F.col("o_orderkey") % 10 == 0)
        .orderBy("o_orderkey")
    )


# UNPIVOT (melt): wide per-flag quantity columns back to long form. The
# Spark side uses unpivot()/melt; the oracle uses DuckDB's UNPIVOT clause.
_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT l_linestatus,
         round(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0.0), 2) AS A,
         round(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0.0), 2) AS N,
         round(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0.0), 2) AS R
  FROM lineitem GROUP BY l_linestatus
)
SELECT l_linestatus, flag, qty
FROM wide UNPIVOT (qty FOR flag IN (A, N, R))
ORDER BY l_linestatus, flag
"""


@query("unpivot_returnflag", oracle=_UNPIVOT_ORACLE)
def q_unpivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_linestatus",
            *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("A", "N", "R")],
        )
    )
    return wide.unpivot(
        ["l_linestatus"], ["A", "N", "R"], "flag", "qty"
    ).orderBy("l_linestatus", "flag")
