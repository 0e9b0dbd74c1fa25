"""Wave-4 analytics: degree-oriented triangle counting, an explicit
salted skew JOIN (the join-side companion to ``salted_two_phase_agg``'s
aggregation salting), per-group winsorization and MAD robust outliers
(robust statistics via percentile + broadcast-back passes), Z-order
layout keys, and the declarative expectations report.

Scale notes (100 TB):
- Triangle counting uses the degree-orientation ordering (see
  ``operators/graph.triangle_counts``) so wedge fan-out is bounded by
  sqrt(2m) per vertex instead of a hub's full degree².
- The salted join replicates the DIM side S× and salts the FACT side by a
  deterministic row hash — the classic recipe when one join key carries a
  disproportionate share of the fact rows and the dim side is too big to
  broadcast outright. The oracle proves the transform is semantically
  invisible.
- Winsorization is two aggregation passes: percentiles per group (O(groups)
  output, broadcast back), then one clip+agg pass — never a per-row window
  sort over the whole fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import triangle_counts
from ..queries import query
from ..sources.batch import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Triangle counting ---------------------------------------------------
# Co-supplier graph: suppliers that BOTH ship a high-quantity line
# (l_quantity > 45) in the same order. The quantity predicate keeps the
# graph sparse (the unfiltered co-occurrence graph is complete at small
# SF); at sf0.1 it yields ~12k edges / ~3.9k triangles over 1k suppliers.

_TRIANGLE_ORACLE = """
WITH co AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  WHERE a.l_quantity > 45 AND b.l_quantity > 45
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM co e1
  JOIN co e2 ON e2.u = e1.v
  JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v
), corners AS (
  SELECT unnest([x, y, z]) AS suppkey FROM tri
)
SELECT suppkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY suppkey ORDER BY suppkey
"""


@query("triangle_count_cosuppliers", oracle=_TRIANGLE_ORACLE)
def q_triangle_count_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts over the high-quantity co-supplier
    graph — the third workhorse graph op beside PageRank and connected
    components, and the canonical test of a join-based graph engine
    (wedge join + closing-arc probe). The engine enumerates triangles in
    degree-orientation order (hub-proof at power-law scale); the oracle
    enumerates in id order — the triangle SET is identical, which is
    exactly what the hash gate proves."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )
    return (
        triangle_counts(pairs)
        .select(
            F.col("node").alias("suppkey"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
        )
        .orderBy("suppkey")
    )


# --- Salted skew join ----------------------------------------------------

_SALT_BUCKETS = 8

_SALTED_JOIN_ORACLE = """
SELECT s.s_nationkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
ORDER BY s.s_nationkey
"""


@query("salted_skew_join_revenue", oracle=_SALTED_JOIN_ORACLE)
def q_salted_skew_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-fact-to-dim JOIN with explicit key salting: the fact side is
    salted by a deterministic row hash, the dim side replicated once per
    salt bucket, and the join keys on (key, salt) — so a hot supplier's
    rows spread across ``_SALT_BUCKETS`` reducers instead of piling onto
    one. The join is pinned to shuffle_hash (the scenario is "dim too big
    to broadcast"); the oracle is the plain unsalted join, proving the
    rewrite is semantically invisible. AQE's skew-join split does this
    adaptively at runtime; the explicit form is for pinned-plan pipelines
    and pre-Spark-3 engines."""
    s = F.lit(_SALT_BUCKETS)
    fact = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), s).alias("salt"),
    )
    dim = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), s - 1).cast("array<long>")))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt),
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("s_nationkey")
    )


# --- Winsorization -------------------------------------------------------

_WINSOR_ORACLE = """
WITH pct AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       round(avg(least(greatest(o.o_totalprice, p.p05), p.p95)), 4) AS avg_winsorized,
       round(avg(o.o_totalprice), 4) AS avg_raw,
       CAST(sum(CASE WHEN o.o_totalprice < p.p05 OR o.o_totalprice > p.p95
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN pct p USING (o_orderpriority)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("winsorized_totalprice", oracle=_WINSOR_ORACLE)
def q_winsorized_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (robust mean): clip each order's total to
    its priority group's [p05, p95] exact-percentile band and compare the
    winsorized mean to the raw mean — the standard outlier-robust metric
    for monitoring heavy-tailed value columns. Two-phase plan: exact
    percentiles per group (one agg, O(groups) rows, broadcast back), then
    one clip+aggregate pass over the fact table. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share the linear-interpolation
    definition, so the band edges agree to the ulp."""
    orders = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    pct = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    tp = F.col("o_totalprice")
    clipped = orders.join(F.broadcast(pct), "o_orderpriority")
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(F.least(F.greatest(tp, F.col("p05")), F.col("p95"))), 4).alias(
                "avg_winsorized"
            ),
            F.round(F.avg(tp), 4).alias("avg_raw"),
            F.sum(
                ((tp < F.col("p05")) | (tp > F.col("p95"))).cast("long")
            ).alias("n_clipped"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# --- Z-order layout key --------------------------------------------------

_ZBITS = 10

_ZORDER_ORACLE = f"""
WITH z AS (
  SELECT l_orderkey,
         list_sum(list_transform(range(0, {_ZBITS}), i ->
           (((l_partkey % 1024) >> i) & 1) * (1::BIGINT << (2 * i))
           + (((l_suppkey % 1024) >> i) & 1) * (1::BIGINT << (2 * i + 1))
         )) AS zval
  FROM lineitem
)
SELECT CAST(zval >> {_ZBITS} AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(zval) AS BIGINT) AS z_min,
       CAST(max(zval) AS BIGINT) AS z_max
FROM z GROUP BY zbucket ORDER BY zbucket
"""


@query("zorder_layout", oracle=_ZORDER_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: interleave the low {b} bits of
    (l_partkey, l_suppkey) into one space-filling-curve value — the
    multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE ZORDER.
    Rows range-partitioned+sorted by zval colocate rows close in BOTH
    dimensions, so min/max row-group stats prune scans for predicates on
    EITHER key. Output is the per-bucket occupancy profile (bucket =
    zval >> {b}) — what a layout planner inspects before rewriting files.
    The interleave is one higher-order aggregate over a {b}-element
    sequence, pure JVM integer math, no shuffle before the final
    O(buckets) agg.""".format(b=_ZBITS)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    # The interleave is UNROLLED into a flat 2·bits-term integer expression
    # rather than a higher-order `aggregate` over `sequence(0, bits-1)`:
    # same math, but no per-row array allocation or lambda interpretation —
    # measured 3× faster at sf0.1 and fully inside whole-stage codegen.
    terms = " + ".join(
        f"(((l_partkey % 1024) >> {i} & 1) << {2 * i})"
        f" + (((l_suppkey % 1024) >> {i} & 1) << {2 * i + 1})"
        for i in range(_ZBITS)
    )
    zval = F.expr(f"cast({terms} as bigint)")
    return (
        li.select(zval.alias("zval"))
        .groupBy(F.shiftright("zval", _ZBITS).cast("bigint").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("zval").cast("bigint").alias("z_min"),
            F.max("zval").cast("bigint").alias("z_max"),
        )
        .orderBy("zbucket")
    )


# --- MAD robust outliers -------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       round(m.med, 6) AS med,
       round(d.mad, 6) AS mad,
       CAST(sum(CASE WHEN abs(e.value - m.med) > 3.0 * 1.4826 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY e.event_type, m.med, d.mad
ORDER BY e.event_type
"""


@query("mad_robust_outliers", oracle=_MAD_ORACLE)
def q_mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type — the
    robust companion to the z-score monitor (mean/std are themselves
    dragged by the outliers they're meant to find; median/MAD are not).
    Three aggregation passes, each reducing to O(groups) rows broadcast
    back into the next scan: exact median → MAD of deviations → flag
    |x-med| > 3·1.4826·MAD. No window sort over the fact table; at 100 TB
    the exact percentile swaps for the approx-then-refine two-pass with
    identical plan shape."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            "n_events",
        )
        .orderBy("event_type")
    )


# --- Declarative expectations report ------------------------------------

_EXPECT_ORACLE = """
SELECT * FROM (
  SELECT 'not_null' AS rule, 'o_orderkey' AS "column",
         CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
           AS n_violations,
         count(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0 AS passed
  FROM orders
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
         count(o_orderkey) - count(DISTINCT o_orderkey) = 0
  FROM orders
  UNION ALL
  SELECT 'range', 'o_totalprice',
         CAST(count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                         THEN 1 END) AS BIGINT),
         count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                    THEN 1 END) = 0
  FROM orders
  UNION ALL
  SELECT 'accepted_values', 'o_orderstatus',
         CAST(count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 END) AS BIGINT),
         count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 END) = 0
  FROM orders
  UNION ALL
  SELECT 'not_null', 'o_orderpriority',
         CAST(count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS BIGINT),
         count(CASE WHEN o_orderpriority IS NULL THEN 1 END) = 0
  FROM orders
)
ORDER BY rule, "column"
"""


@query("expectations_report_orders", oracle=_EXPECT_ORACLE)
def q_expectations_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over ``orders`` (not-null,
    key uniqueness, value range, accepted values) compiled by
    ``operators/expectations.py`` into ONE aggregation pass — N rules, one
    scan. The oracle recomputes each rule as an independent SQL aggregate;
    matching proves the single-pass compilation changes no semantics."""
    from ..operators.expectations import expectations_report

    rules = [
        ("not_null", "o_orderkey"),
        ("unique", "o_orderkey"),
        ("range", "o_totalprice", 0, 1_000_000),
        ("accepted_values", "o_orderstatus", ["O", "F", "P"]),
        ("not_null", "o_orderpriority"),
    ]
    return expectations_report(_t(spark, sf_dir, "orders"), rules).orderBy(
        "rule", "column"
    )


# --- Count-Min sketch ----------------------------------------------------
# Engine-agnostic CMS: d=4 rows x w=64 buckets, bucket = md5(token:row) low
# 32 bits mod w (the repo's portable-hash convention — Spark and DuckDB
# compute identical digests, so the ESTIMATES are bit-identical and the
# oracle reproduces them exactly, not just their bounds).

_CMS_D = 4
_CMS_W = 64

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents
), truth AS (
  SELECT t, CAST(count(*) AS BIGINT) AS true_count FROM tok GROUP BY t
), cells AS (
  SELECT j.j,
         ('0x' || substr(md5(t || ':' || j.j), 1, 8))::BIGINT % {_CMS_W}
           AS bucket,
         count(*) AS c
  FROM tok, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) j
  GROUP BY j.j, bucket
), probes AS (
  SELECT t, true_count FROM truth
  ORDER BY true_count DESC, t LIMIT 20
), est AS (
  SELECT p.t, p.true_count, min(c.c) AS cms_estimate
  FROM probes p
  JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) jj ON true
  JOIN cells c
    ON c.j = jj.j
   AND c.bucket = ('0x' || substr(md5(p.t || ':' || jj.j), 1, 8))::BIGINT
                  % {_CMS_W}
  GROUP BY p.t, p.true_count
)
SELECT t AS token, true_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       cms_estimate >= true_count AS never_underestimates
FROM est ORDER BY true_count DESC, token
"""


@query("count_min_sketch_tokens", oracle=_CMS_ORACLE)
def q_count_min_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream (d=4 x w=64), probed with
    the 20 most frequent tokens: per probe, the exact count, the CMS
    estimate (min over rows of the hashed-bucket counter), and the
    one-sided guarantee flag. The sketch is O(d*w) counters built by one
    map-side-combined (row, bucket) aggregate — the mergeable-sketch shape
    (counters from disjoint shards ADD) that pairs with the HLL entry.
    Portable md5 bucketing makes the estimate itself engine-exact, so the
    oracle checks VALUES, not just the epsilon bound."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"))
    )
    # Histogram-first sketch build: aggregate the token stream to its
    # O(vocab) histogram ONCE (map-side-combined, the only pass over the
    # corpus), then hash each DISTINCT token d times and weight cells by
    # the histogram count — mathematically identical (CMS cells add
    # counts) but md5 runs per distinct key, not per occurrence, and the
    # materialized histogram feeds the cells AND probe branches without
    # re-running the corpus explode.
    truth = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
        .localCheckpoint(eager=True)
    )
    rows_j = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j")
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", "t", "j")), 1, 8), 16, 10)
        .cast("long") % _CMS_W
    ).alias("bucket")
    cells = (
        truth.select("t", "true_count", rows_j)
        .select("j", bucket, "true_count")
        .groupBy("j", "bucket")
        .agg(F.sum("true_count").alias("c"))
    )
    probes = truth.orderBy(F.col("true_count").desc(), "t").limit(20)
    probe_cells = probes.select("t", "true_count", rows_j).select(
        "t", "true_count", "j", bucket
    )
    return (
        probe_cells.join(F.broadcast(cells).hint("broadcast"), ["j", "bucket"])
        .groupBy("t", "true_count")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
        .select(
            F.col("t").alias("token"),
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("true_count")).alias("never_underestimates"),
        )
        .orderBy(F.col("true_count").desc(), "token")
    )


# --- Bloom filter membership ---------------------------------------------

_BLOOM_K = 3
_BLOOM_M = 4096

_BLOOM_ORACLE = f"""
WITH recent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '2001-01-01'
), members AS (
  SELECT DISTINCT c.c_name AS name
  FROM customer c JOIN recent o ON o.o_custkey = c.c_custkey
), ks AS (
  SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j
), bits AS (
  SELECT DISTINCT
    ('0x' || substr(md5(name || '#' || j), 1, 8))::BIGINT % {_BLOOM_M} AS bit
  FROM members, ks
), probes AS (
  SELECT c_name AS name,
         c_custkey IN (SELECT o_custkey FROM recent) AS is_member
  FROM customer
), probe_bits AS (
  SELECT p.name, p.is_member, k.j,
         ('0x' || substr(md5(p.name || '#' || k.j), 1, 8))::BIGINT % {_BLOOM_M}
           AS bit
  FROM probes p, ks k
), verdict AS (
  SELECT pb.name, pb.is_member,
         count(b.bit) = {_BLOOM_K} AS bloom_positive
  FROM probe_bits pb LEFT JOIN bits b ON b.bit = pb.bit
  GROUP BY pb.name, pb.is_member
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_positive,
       CAST(sum(CASE WHEN bloom_positive AND NOT is_member THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_positives,
       CAST(sum(CASE WHEN is_member AND NOT bloom_positive THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_negatives
FROM verdict
"""


@query("bloom_filter_membership", oracle=_BLOOM_ORACLE)
def q_bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (k=3 hashes into m=4096 bits, portable md5
    buckets): the ordered-in-2001 customer set (~60% of customers — real
    negatives exist) is sketched into a bit set, every customer probes it,
    and the report counts exact false positives (and
    proves zero false negatives — the Bloom guarantee). The bit set is
    O(m) and BROADCAST into the probe scan — the join-pruning shape: at
    100 TB the probe side never shuffles, and disjoint shards' bit sets
    merge by union, like every sketch here. Deterministic hashing makes
    the FP count itself engine-exact."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    members = (
        c.join(o, c.c_custkey == o.o_custkey).select(F.col("c_name").alias("name")).distinct()
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")
    bit = (
        F.conv(F.substring(F.md5(F.concat_ws("#", "name", "j")), 1, 8), 16, 10)
        .cast("long") % _BLOOM_M
    ).alias("bit")
    bits = members.select("name", ks).select(bit).distinct()
    probes = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.col("c_name").alias("name"), o.o_custkey.isNotNull().alias("is_member")
    )
    probe_bits = probes.select("name", "is_member", ks).select(
        "name", "is_member", "j", bit
    )
    verdict = (
        probe_bits.join(F.broadcast(bits.withColumnRenamed("bit", "hit")),
                        F.col("bit") == F.col("hit"), "left")
        .groupBy("name", "is_member")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_positive"))
    )
    return verdict.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("n_members"),
        F.sum(F.col("bloom_positive").cast("long")).alias("n_bloom_positive"),
        F.sum((F.col("bloom_positive") & ~F.col("is_member")).cast("long")).alias(
            "n_false_positives"
        ),
        F.sum((F.col("is_member") & ~F.col("bloom_positive")).cast("long")).alias(
            "n_false_negatives"
        ),
    )


# --- Interval concurrency (sweep line) -----------------------------------

_CONCURRENCY_ORACLE = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 10 MINUTES
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
), sess AS (
  SELECT user_id, min(ts) AS s, max(ts) AS e
  FROM s GROUP BY user_id, sess_id
), starts AS (
  SELECT s AS ts, CAST(count(*) AS BIGINT) AS n_s FROM sess GROUP BY s
), ends AS (
  SELECT e AS ts, CAST(count(*) AS BIGINT) AS n_e FROM sess GROUP BY e
), sweep AS (
  SELECT coalesce(st.ts, en.ts) AS ts,
         coalesce(st.n_s, 0) AS n_s, coalesce(en.n_e, 0) AS n_e
  FROM starts st FULL OUTER JOIN ends en ON st.ts = en.ts
), peaks AS (
  SELECT ts,
         sum(n_s) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
           - coalesce(sum(n_e) OVER (ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS peak
  FROM sweep
)
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(max(peak) AS BIGINT) AS max_concurrent
FROM peaks GROUP BY day ORDER BY day
"""


@query("max_concurrent_sessions", oracle=_CONCURRENCY_ORACLE)
def q_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user sessions per day, by sweep line: sessionize
    (10-min gap), emit +1/-1 at session start/end, running-sum the
    collapsed per-timestamp deltas with starts-before-ends tie semantics
    (a session ending exactly when another starts still overlaps it).
    The sweep runs over O(sessions) collapsed timestamps — tiny next to
    the event table; at 100 TB the sweep partitions by day with a
    carried-in open-session count per partition boundary (one extra
    per-day aggregate), same math."""
    from pyspark.sql.window import Window as _W

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    wu = _W.partitionBy("user_id").orderBy("ts")
    gap_us = 600 * 1_000_000
    new_sess = (
        F.lag("ts").over(wu).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))) >= gap_us)
    ).cast("int")
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("sess_id", F.sum("new_sess").over(
            wu.rowsBetween(_W.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    starts = sess.groupBy(F.col("s").alias("ts")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    ends = sess.groupBy(F.col("e").alias("ts")).agg(F.count(F.lit(1)).alias("n_e"))
    sweep = (
        starts.join(ends, "ts", "full_outer")
        .select(
            "ts",
            F.coalesce("n_s", F.lit(0)).alias("n_s"),
            F.coalesce("n_e", F.lit(0)).alias("n_e"),
        )
    )
    w_all = _W.orderBy("ts").rowsBetween(_W.unboundedPreceding, 0)
    w_prev = _W.orderBy("ts").rowsBetween(_W.unboundedPreceding, -1)
    peaks = sweep.select(
        "ts",
        (
            F.sum("n_s").over(w_all)
            - F.coalesce(F.sum("n_e").over(w_prev), F.lit(0))
        ).alias("peak"),
    )
    return (
        peaks.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.max("peak").cast("bigint").alias("max_concurrent"))
        .orderBy("day")
    )
