"""Second TPC-H batch (adapted): Q2, Q8, Q9, Q12, Q13, Q15, Q16, Q17, Q19,
Q20, Q21.

The driver schema has no partsupp table and no
l_commitdate/l_receiptdate/l_shipmode/p_container columns, so each query is
ADAPTED: lineitem serves as the part<->supplier link where partsupp is
required, and "late" is defined as shipping more than N days after the
order date. What each adaptation preserves is the query's characteristic
PLAN SHAPE — correlated-min subquery (Q2), market-share conditional ratio
over a two-dimension join (Q8), profit expression over the full join chain
(Q9), CASE-count classification join (Q12), outer-join histogram (Q13),
scalar-max subquery against an aggregate (Q15), distinct-count with
exclusion filter (Q16), correlated per-group average (Q17), OR-of-ANDs
pushdown (Q19), nested semi-join chain (Q20), and EXISTS + NOT EXISTS on
the same fact table (Q21).

Scale notes: every dimension join (part, supplier, customer, nation,
region) broadcasts; the only wide shuffles are on l_orderkey / l_partkey /
l_suppkey, which is the minimum the semantics allow. Correlated subqueries
are expressed as aggregate-then-join (never per-row), so Catalyst plans
them as one extra shuffle, not O(n) subplans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries import query
from ..sources.batch import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# Q2 (adapted): min-cost supplier per part. partsupp is absent, so the
# part->supplier offer table is derived from lineitem (min extendedprice per
# (part, supplier)); the Q2 shape — correlated MIN subquery joined back to
# the offer relation — is intact.
_Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice) AS price
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT o.partkey, min(o.price) AS min_price
  FROM offers o JOIN eu ON o.suppkey = eu.s_suppkey
  GROUP BY o.partkey
)
SELECT round(eu.s_acctbal, 2) AS s_acctbal, eu.s_name, eu.n_name,
       p.p_partkey, p.p_brand, round(o.price, 2) AS price
FROM part p
JOIN best  ON p.p_partkey = best.partkey
JOIN offers o ON o.partkey = p.p_partkey AND o.price = best.min_price
JOIN eu    ON o.suppkey = eu.s_suppkey
WHERE p.p_size = 15
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, price
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The per-part min is over EU offers only — independent of the part
    # predicate — so p_size=15 pushes all the way to the lineitem scan as a
    # broadcast SEMI join BEFORE the (partkey, suppkey) aggregate: the
    # shuffle carries ~1/50th of the pairs. The min-then-join-back of the
    # oracle's `best` CTE collapses to a window over the aggregated
    # relation (one extra small shuffle, no second evaluation of the
    # offers subtree — the previous shape computed eu_offers twice).
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15).select("p_partkey", "p_brand")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    offers = (
        li.groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.min("l_extendedprice").alias("price"))
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(_t(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_offers = offers.join(
        F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("partkey")
    return (
        eu_offers.withColumn("min_price", F.min("price").over(w))
        .filter(F.col("price") == F.col("min_price"))
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("price", 2).alias("price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "price")
        .limit(100)
    )


# Q8: national market share — NATION_1's share of AMERICA's revenue in STANDARD
# parts, by year. Full 6-table join; the share is a conditional-sum ratio.
_Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN part      ON l_partkey = p_partkey
WHERE r_name = 'AMERICA' AND p_type LIKE 'STANDARD%'
GROUP BY 1
ORDER BY 1
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type").like("STANDARD%"))
        .select("p_partkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0)) / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# Q9 (adapted): product-type profit by nation and year. ps_supplycost is
# absent; cost is modeled as p_retailprice * l_quantity * 0.1 — the profit
# EXPRESSION over the full lineitem⨝orders⨝part⨝supplier⨝nation chain is
# what the query exercises.
_Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * 0.1), 2) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@query("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# Q12 (adapted): shipping classification — l_shipmode/commit/receipt dates
# are absent, so lines are classed "late" (shipped > 90 days after order
# date) vs on-time, counting urgent vs non-urgent orders per class. The
# orders⨝lineitem join + CASE-count aggregation is the Q12 shape.
_Q12_ORACLE = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
ORDER BY 1
"""


@query("q12_shipmode_priority", oracle=_Q12_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                "LATE",
            )
            .otherwise("ONTIME")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# Q13: customer order-count distribution — LEFT join (customers with zero
# orders count!) then a histogram over the per-customer counts. The
# non-urgent filter stands in for the original comment NOT LIKE.
_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# Q15: top supplier(s) by quarterly revenue — aggregate, then a scalar-max
# subquery joined back (ties kept, like the reference view formulation).
_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# Q16 (adapted): supplier counts by part attributes — lineitem links parts
# to suppliers (partsupp is absent); distinct-count per (brand, type, size)
# excluding one brand, like the original's NOT LIKE exclusions.
_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_part_counts", oracle=_Q16_ORACLE)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# Q17 (adapted): revenue from small-quantity orders of one brand's parts —
# the correlated per-part average (l_quantity < 0.5 * avg per part) is
# expressed as aggregate-then-join, never a per-row subquery. p_container
# is absent; p_size stands in.
_Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#2' AND p_size < 15
  AND l_quantity < 0.5 * avg_qty
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# Q19 (adapted): disjunctive predicate revenue — three OR'd conjunction
# groups over brand/size/quantity (p_container absent). Catalyst pushes the
# common l_partkey join and the OR tree into one scan.
_Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# Q20 (adapted): suppliers who shipped an above-average share of some
# 'small'-named part — partsupp's availqty test becomes "this supplier's
# shipped qty for the part exceeds half the part's average per-supplier
# shipped qty". The nested semi-join chain (parts -> qualifying supplier
# offers -> suppliers in one nation) is the Q20 shape.
_Q20_ORACLE = """
WITH forest_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
supp_part_qty AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM forest_parts)
  GROUP BY 1, 2
),
part_avg AS (
  SELECT l_partkey AS pk, avg(qty_per_supp) AS avg_qty FROM (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_per_supp
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM forest_parts)
    GROUP BY 1, 2
  ) GROUP BY 1
),
qualifying AS (
  SELECT DISTINCT s.l_suppkey
  FROM supp_part_qty s JOIN part_avg a ON s.l_partkey = a.pk
  WHERE s.qty > 0.5 * a.avg_qty
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_11'
  AND s_suppkey IN (SELECT l_suppkey FROM qualifying)
ORDER BY s_name
"""


@query("q20_excess_stock_suppliers", oracle=_Q20_ORACLE)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    forest = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(forest), F.col("l_partkey") == F.col("p_partkey")
    )
    spq = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("qty"))
    part_avg = spq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("qty").alias("avg_qty")
    )
    qualifying = (
        spq.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty") > 0.5 * F.col("avg_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_11")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, "s_suppkey", "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# Q21 (adapted): suppliers who were the sole late shipper in multi-supplier
# orders ("late" = shipped > 60 days after order date; commit/receipt dates
# are absent). The oracle keeps the Q21 double-correlated EXISTS/NOT-EXISTS
# shape; the Spark plan uses the algebraic collapse: per order the predicate
# pair is exactly (n_late = 1 AND n_supp >= 2), so one lineitem⋈orders join
# feeds two cascading aggregates — (orderkey, suppkey) then orderkey — both
# of which reuse the join's hash partitioning on l_orderkey (zero extra
# shuffles; the semi/anti formulation scanned lineitem 3x and computed the
# late set twice with no exchange reuse).
_Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  GROUP BY 1, 2
),
all_supp AS (
  SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY 1, 2
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM all_supp l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    # A (order, supplier) pair is late iff ANY of its line items is late;
    # map-side partial aggregation collapses the ~4 rows/pair before any data
    # moves, and the shuffle introduced by the join on l_orderkey satisfies
    # the clustering of both groupBys ([ok] ⊆ [ok, sk]), so neither
    # aggregate adds an exchange.
    pair = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(is_late, F.lit(1)).otherwise(F.lit(0))).alias("is_late"))
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    sole_late = per_order.filter((F.col("n_late") == 1) & (F.col("n_supp") >= 2))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# Q11 (adapted): important-part value share — partsupp's availqty*supplycost
# becomes shipped value (extendedprice * quantity) of one nation's
# suppliers; keep parts above 3x the average part value (scale-invariant,
# unlike the original's fraction-of-total, which goes vacuous as the part
# catalog grows). The Q11 shape
# is the scalar-subquery HAVING: the same aggregate computed globally
# (1-row broadcast) gates the per-group rows.
_Q11_ORACLE = """
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_11'
),
val AS (
  SELECT l_partkey AS partkey, sum(l_extendedprice * l_quantity) AS value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM nat_supp)
  GROUP BY l_partkey
)
SELECT partkey, round(value, 2) AS value
FROM val
WHERE value > (SELECT avg(value) * 3 FROM val)
ORDER BY value DESC, partkey
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat_supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_11")
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    val = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    thresh = val.agg((F.avg("value") * 3).alias("thresh"))
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("thresh"))
        .select("partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )
