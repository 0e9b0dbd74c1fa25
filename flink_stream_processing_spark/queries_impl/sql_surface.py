"""Pure-SQL surface: queries expressed as ANSI SQL TEXT over registered
temp views and executed via ``spark.sql`` — proving the engine's second
front-end (everything else in queries_impl uses the DataFrame DSL; both
lower to the same Catalyst plans, and these entries gate that claim with
the same DuckDB oracles).

The SQL dialect is kept to the ANSI intersection so the Spark text and
the DuckDB oracle stay near-identical — differences are confined to
epoch-millis extraction (``unix_millis`` vs ``epoch_ms``).

Scale note: view registration is catalog metadata only; the plans below
are the same pushdown/pruning/broadcast shapes as their DSL twins (a
temp view over a parquet scan is not a materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries import query
from ..sources.batch import load_table

_VIEWS = ("orders", "lineitem", "customer", "nation", "region", "events", "documents")


def _register_views(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Register per-sf temp views (suffixed so concurrent sf_dirs never
    collide) and return the logical->view name mapping."""
    suffix = "".join(c if c.isalnum() else "_" for c in sf_dir)
    names = {}
    for t in _VIEWS:
        name = f"sqlsurf_{t}_{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names[t] = name
    return names


_REVENUE_SQL = """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM {orders} o
JOIN {customer} c ON o.o_custkey = c.c_custkey
JOIN {nation} n   ON c.c_nationkey = n.n_nationkey
JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
ORDER BY nation
"""

_REVENUE_ORACLE = _REVENUE_SQL.format(
    orders="orders", customer="customer", nation="nation", lineitem="lineitem"
)


@query("sql_surface_revenue_by_nation", oracle=_REVENUE_ORACLE)
def q_sql_surface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join revenue rollup submitted as SQL TEXT — the oracle runs
    the IDENTICAL string (modulo view names) in DuckDB, so this also
    pins dialect compatibility of the shared subset. Catalyst gets the
    same plan freedoms as the DSL (join reordering, broadcast of the
    nation/customer dims, pushdown of the status filter)."""
    v = _register_views(spark, sf_dir)
    return spark.sql(_REVENUE_SQL.format(**v))


_RANK_SQL = """
SELECT user_id, event_id, value, value_rank
FROM (
  SELECT user_id, event_id, value,
         CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
              AS BIGINT) AS value_rank
  FROM {events}
  WHERE event_type = 'purchase'
)
WHERE value_rank <= 3
ORDER BY user_id, value_rank, event_id
"""

_RANK_ORACLE = _RANK_SQL.format(events="events")


@query("sql_surface_topk_window", oracle=_RANK_ORACLE)
def q_sql_surface_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-k per key in SQL text (rank + subquery filter —
    the ANSI form; QUALIFY is not in the shared dialect subset, Spark SQL
    rejects it). The oracle runs the identical string. Same single
    user_id exchange as the DSL ranking queries."""
    v = _register_views(spark, sf_dir)
    return spark.sql(_RANK_SQL.format(**v))


_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM {orders} o JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT DISTINCT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
  FROM {orders} o JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
), start AS (
  SELECT CAST(min(o_custkey) * 2 AS BIGINT) AS node FROM {orders}
), walk (node, depth) AS (
  SELECT node, 0 FROM start
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 2
)
SELECT node, CAST(min(depth) AS BIGINT) AS min_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM walk
GROUP BY node
ORDER BY node
"""

_REACH_ORACLE = _REACH_SQL.format(orders="orders", lineitem="lineitem")


_REACH_WALK_SQL = """
WITH RECURSIVE start AS (
  SELECT CAST(min(o_custkey) * 2 AS BIGINT) AS node FROM {orders}
), walk (node, depth) AS (
  SELECT node, 0 FROM start
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN {edges} e ON e.src = w.node
  WHERE w.depth < 2
)
SELECT node, CAST(min(depth) AS BIGINT) AS min_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM walk
GROUP BY node
ORDER BY node
"""


@query("sql_surface_recursive_reachability", oracle=_REACH_ORACLE)
def q_sql_surface_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.x `WITH RECURSIVE`) in SQL text: bounded BFS
    from the lowest customer over the symmetrized customer-supplier graph
    — per reachable node, its minimum hop depth and path multiplicity.
    The recursion's UNION ALL accumulation semantics stay pinned against
    DuckDB's identical walk; depth is capped at 2 (UNION ALL recursion
    multiplies PATHS, not nodes — unbounded traversals belong to the
    dedicated iterative operators).

    r19 optimization (guide §2.4 "remove shuffles outright"): the edge
    relation is MATERIALIZED once before the recursion. Spark's recursive
    execution (UnionLoop) re-evaluates every relation the step references
    on each iteration, so with the edge CTE inlined the orders⋈lineitem
    join + DISTINCT ran three times (once per depth) — measured 7.7 s at
    sf0.1, ~2.9 s after. The build itself also halves: both edge
    directions come from ONE distinct customer–supplier pair join instead
    of two independent DISTINCT join subtrees (the oracle keeps the
    original two-subtree text; by parity-encoding the directions are
    disjoint, so one mirrored distinct pair set is the identical edge
    multiset — oracle-hash-proven)."""
    v = _register_views(spark, sf_dir)
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=True)
    )
    suffix = "".join(ch if ch.isalnum() else "_" for ch in sf_dir)
    edge_view = f"sqlsurf_reach_edges_{suffix}"
    edges.createOrReplaceTempView(edge_view)
    return spark.sql(_REACH_WALK_SQL.format(orders=v["orders"], edges=edge_view))


_PYDS_ORACLE = """
WITH g AS (
  SELECT i, (i * 48271) % 2147483647 AS h
  FROM (SELECT unnest(generate_series(0, 999)) AS i)
)
SELECT i AS txn_id,
       (h % 1000000) / 100.0 AS amount,
       ['USD', 'EUR', 'GBP', 'JPY', 'CNY'][(h % 5) + 1] AS currency,
       CASE WHEN h % 5 = 4 THEN 0.0 ELSE ((h % 400) + 50) / 100.0 END
         AS exchange_rate
FROM g
ORDER BY txn_id
"""


@query("python_datasource_transactions", oracle=_PYDS_ORACLE)
def q_python_datasource_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom PYTHON DATA SOURCE (Spark 4.x pluggable-connector API):
    1000 synthetic transactions read through
    ``spark.read.format("txn_gen")`` across 4 InputPartitions — the
    reference generator as a catalog-pluggable source rather than a
    driver loop. The Lehmer-LCG synthesis is 63-bit-safe integer math, so
    the oracle regenerates the identical rows from generate_series; the
    hash gate therefore proves the partitioned Python reader loses/dups
    nothing."""
    from pyspark.sql import functions as F

    from ..sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("txn_gen")
        .option("rows", "1000")
        .option("partitions", "4")
        .load()
    )
    return df.select(
        "txn_id", F.round("amount", 6).alias("amount"), "currency",
        F.round("exchange_rate", 6).alias("exchange_rate"),
    ).orderBy("txn_id")


# --- Python UDTF (Spark 4 user-defined table function) -------------------

_WIN_WIDTH = 32

_UDTF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(w.i AS BIGINT) AS win_idx,
       CAST(least({_WIN_WIDTH}, len(toks) - w.i * {_WIN_WIDTH}) AS BIGINT)
         AS n_toks,
       toks[w.i * {_WIN_WIDTH} + 1] AS first_tok
FROM t, LATERAL (
  SELECT unnest(generate_series(
    0, CAST(ceil(len(toks) / {_WIN_WIDTH}.0) AS INT) - 1)) AS i) w
ORDER BY doc_id, win_idx
"""


@query("udtf_token_windows", oracle=_UDTF_ORACLE)
def q_udtf_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``pyspark.sql.functions.udtf``) called via
    LATERAL in SQL text: each document expands to its fixed-width token
    windows (index, size, first token) — the table-function API surface,
    completing the Python lane (pandas_udf / mapInPandas / applyInPandas /
    applyInPandasWithState / DataSource / UDTF). Arrow-optimized
    (``useArrow=True``); the equivalent set-expansion for hot paths stays
    the declarative sequence+explode form (doc_chunks) — this entry pins
    the API's correctness, not a scale path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx bigint, n_toks bigint, first_tok string", useArrow=True)
    class TokenWindows:
        def eval(self, text: str, width: int):
            toks = text.lower().strip().split()
            for w in range(0, len(toks), width):
                chunk = toks[w : w + width]
                yield (w // width, len(chunk), chunk[0])

    spark.udtf.register("token_windows", TokenWindows)
    v = _register_views(spark, sf_dir)
    # REPARTITION hint: the documents scan is one split at bench scale, so
    # without it the (row-at-a-time) UDTF runs in a single Python worker;
    # spreading the narrow (doc_id, text) relation first fans the Python
    # evaluation across every core (guide §4 — parallelism is the only
    # lever left once the boundary itself is required, which it is here:
    # the UDTF API surface IS what this query pins).
    n_spread = spark.sparkContext.defaultParallelism
    return spark.sql(f"""
        SELECT d.doc_id, t.win_idx, t.n_toks, t.first_tok
        FROM (SELECT /*+ REPARTITION({n_spread}) */ doc_id, text
              FROM {v['documents']}) d,
             LATERAL token_windows(d.text, {_WIN_WIDTH}) t
        ORDER BY d.doc_id, t.win_idx
    """)


# --- SQL pipe syntax (Spark 4) -------------------------------------------

_PIPE_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
GROUP BY c.c_mktsegment
ORDER BY segment
"""


@query("sql_surface_pipe_syntax", oracle=_PIPE_ORACLE)
def q_sql_surface_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (SPARK-49555, `|>` operators): the same
    join+filter+aggregate expressed as a linear pipeline — third query
    front-end after the DataFrame DSL and ANSI SQL text. Lowers to the
    identical Catalyst plan as the ANSI form (the oracle), so this entry
    pins both the parser surface and plan equivalence."""
    v = _register_views(spark, sf_dir)
    return spark.sql(f"""
        FROM {v['orders']} AS o
        |> JOIN {v['customer']} AS c ON o.o_custkey = c.c_custkey
        |> WHERE o.o_orderstatus = 'F'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS cnt,
                     round(sum(o.o_totalprice), 2) AS total_price
           GROUP BY c.c_mktsegment AS segment
        |> SELECT segment, cnt, total_price
        |> ORDER BY segment
    """)


# --- correlated LATERAL subquery -----------------------------------------

_LATERAL_ORACLE = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_custkey % 100 = 0
ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
"""


@query("sql_surface_lateral_topk", oracle=_LATERAL_ORACLE)
def q_sql_surface_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    orders per sampled customer) — the SQL-standard form of per-group
    top-k. Spark decorrelates it into a ranked window join (the same plan
    the DSL twin ranking_top3_per_segment builds by hand), so this entry
    pins the decorrelation machinery against the identical DuckDB text."""
    v = _register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey,
               round(t.o_totalprice, 2) AS o_totalprice
        FROM {v['customer']} c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM {v['orders']} o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey % 100 = 0
        ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
    """)


# --- SQL:2023 LISTAGG ----------------------------------------------------

_LISTAGG_ORACLE = """
SELECT o_orderstatus,
       string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
         AS priorities,
       CAST(count(*) AS BIGINT) AS n_priorities
FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("sql_surface_listagg", oracle=_LISTAGG_ORACLE)
def q_sql_surface_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 LISTAGG with WITHIN GROUP ordering (new in Spark 4) —
    ordered string aggregation without the collect_list + array_sort +
    array_join workaround; dedup happens in a DISTINCT subquery (Spark
    4.1's LISTAGG(DISTINCT..) WITHIN GROUP trips an internal SortOrder
    cast, so the standard pre-aggregation form is used). DuckDB's
    string_agg with ORDER BY is the dialect twin; identical output gates
    ordering semantics."""
    v = _register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT o_orderstatus,
               listagg(o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(count(*) AS BIGINT) AS n_priorities
        FROM (SELECT DISTINCT o_orderstatus, o_orderpriority
              FROM {v['orders']})
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """)


# --- Bag-semantics set operators (r5) --------------------------------------
# INTERSECT ALL / EXCEPT ALL keep multiplicities (min / difference of
# duplicate counts) and compare rows with null-safe equality — both corners
# where naive JOIN/WHERE rewrites go wrong (a NULL-keyed row never
# equi-joins but IS a set-op match). The identical text runs on both
# engines; props IS NULL rows in events make the null-equality path
# non-vacuous.

_SET_OPS_SQL = """
WITH views AS (
  SELECT user_id, CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
           AS et
  FROM {events} WHERE event_id % 2 = 0
),
clicks AS (
  SELECT user_id, CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
           AS et
  FROM {events} WHERE event_id % 3 = 0
),
i AS (SELECT * FROM views INTERSECT ALL SELECT * FROM clicks),
x AS (SELECT * FROM views EXCEPT ALL SELECT * FROM clicks),
u AS (SELECT * FROM views UNION SELECT * FROM clicks)
SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(et) AS BIGINT) AS n_nonnull
FROM i
UNION ALL
SELECT 'except_all', CAST(count(*) AS BIGINT), CAST(count(et) AS BIGINT)
FROM x
UNION ALL
SELECT 'union_distinct', CAST(count(*) AS BIGINT), CAST(count(et) AS BIGINT)
FROM u
ORDER BY op
"""

_SET_OPS_ORACLE = _SET_OPS_SQL.format(events="events")


@query("sql_surface_set_ops", oracle=_SET_OPS_ORACLE)
def q_sql_surface_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operators as SQL TEXT: INTERSECT ALL / EXCEPT ALL
    (multiplicity-preserving) and UNION DISTINCT, each over a derived
    relation with planted NULL keys — gating the null-safe row equality
    and duplicate-count semantics the ANSI set ops require (Spark lowers
    these to aggregated/generated count joins; the plan stays a couple of
    hash aggregates, no sort). The reduction to per-op counts keeps the
    gate order-independent while still pinning exact multiplicities."""
    v = _register_views(spark, sf_dir)
    return spark.sql(_SET_OPS_SQL.format(**v))


# --- GROUP BY ALL / ORDER BY ALL (r5) --------------------------------------

_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM {orders}
GROUP BY ALL
ORDER BY ALL
"""

_GROUP_BY_ALL_ORACLE = _GROUP_BY_ALL_SQL.format(orders="orders")


@query("sql_surface_group_by_all", oracle=_GROUP_BY_ALL_ORACLE)
def q_sql_surface_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the SQL:2023-era shorthand both Spark 4
    and DuckDB ship): grouping keys are inferred as every non-aggregate
    select item, ordering as the full select list. The identical text runs
    on both engines, pinning that the inference resolves to the same
    column sets — a pure front-end feature lowering to the ordinary
    hash-aggregate plan."""
    v = _register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL.format(**v))


# --- Ordered-set aggregates (r5) -------------------------------------------

_ORDERED_SET_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(median(o_totalprice), 2) AS median_price,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2)
         AS p25_cont,
       round(percentile_cont(0.90) WITHIN GROUP (ORDER BY o_totalprice), 2)
         AS p90_cont,
       round(percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice), 2)
         AS p50_disc
FROM {orders}
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

_ORDERED_SET_ORACLE = _ORDERED_SET_SQL.format(orders="orders")


@query("sql_surface_ordered_set_aggs", oracle=_ORDERED_SET_ORACLE)
def q_sql_surface_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ordered-set aggregates as TEXT: ``median``,
    ``percentile_cont`` (linear interpolation) and ``percentile_disc``
    (existing-value pick) WITHIN GROUP — the exact-percentile family
    beside the approx_percentile sketches. The identical string runs on
    DuckDB, pinning interpolation arithmetic across engines. Exact
    percentiles need the group sorted — fine per group here; at 100 TB the
    approx sketch (mergeable, one pass) is the default and this surface is
    for final reporting over already-reduced relations."""
    v = _register_views(spark, sf_dir)
    return spark.sql(_ORDERED_SET_SQL.format(**v))
