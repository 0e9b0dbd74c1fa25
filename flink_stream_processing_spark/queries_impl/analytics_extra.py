"""Product-analytics battery over the events/orders tables: retention
cohorts, ordered funnels, time-series gap fill, trailing-window z-score
anomalies, equi-width histograms, table profiling, Pareto frontier, and a
salted two-phase aggregation.

These are the workhorse queries of a large-scale behavioral/metrics
pipeline (the reference's windowed-metrics job grown up: SURVEY.md §2.5's
aggregate family generalized to cohort/funnel/anomaly analytics). Every
query is expressed declaratively so Catalyst keeps pushdown/pruning, and
each carries an exact DuckDB oracle.

Scale notes (100 TB):
- Cohort/funnel/gap-fill shuffle once on user_id and stay keyed — at scale
  that is one hash partition pass over the fact table; no driver state.
- Gap-fill generates each user's day spine with ``sequence``+``explode``,
  bounded by the user's own [min_day, max_day] span — never a global
  calendar cross join.
- The z-score window is a bounded ROWS frame (21 trailing rows), so state
  per key is O(frame), not O(history).
- The histogram broadcasts a single (lo, hi) stats row; bucketing is pure
  per-row math (classic two-pass equi-width at any scale).
- The salted two-phase aggregate shows the skew recipe explicitly: salt →
  partial agg on (key, salt) → final agg on key. AQE does this adaptively;
  the explicit form is for pinned-plan pipelines and is oracle-checked to
  be semantically invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table
from ._shared_oracles import CEP_FUNNEL_ORACLE, EWMA_ORACLE, ZSCORE_ORACLE


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Retention cohorts --------------------------------------------------
# Cohort = ISO week (Monday-truncated) of a user's first event; a cohort
# cell counts distinct users active k whole weeks after their cohort week.
_COHORT_ORACLE = """
WITH activity AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events GROUP BY 1, 2
), coh AS (
  SELECT user_id, min(wk) AS cohort_wk FROM activity GROUP BY 1
)
SELECT epoch_ms(c.cohort_wk)::BIGINT AS cohort_week_ms,
       CAST(datediff('day', c.cohort_wk, a.wk) // 7 AS BIGINT) AS week_no,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN coh c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("retention_cohorts", oracle=_COHORT_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix. One shuffle on user_id builds both
    the activity grid and the cohort assignment; the final cell count is a
    keyed agg on (cohort_week, week_no) — two shuffles total regardless of
    fact-table size. Week arithmetic is whole-day diff // 7 (both weeks are
    Monday-truncated, so the division is exact)."""
    ev = _t(spark, sf_dir, "events")
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    )
    coh = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        activity.join(coh, "user_id")
        .select(
            F.unix_millis("cohort_wk").alias("cohort_week_ms"),
            (F.datediff("wk", "cohort_wk") / F.lit(7))
            .cast("bigint")
            .alias("week_no"),
            "user_id",
        )
        .groupBy("cohort_week_ms", "week_no")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week_ms", "week_no")
    )


# --- Ordered funnel -----------------------------------------------------
# Min-time funnel view -> click -> purchase: a user converts a stage only
# if their earliest event of that stage is strictly after the earliest
# event of the previous stage.
_FUNNEL_ORACLE = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
            AS BIGINT) AS n_view_click,
       CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click)
            AS BIGINT) AS n_full_funnel
FROM f
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage ordered funnel as ONE conditional aggregation pass —
    min-per-stage pivot on user_id (single shuffle), then a scalar
    conditional count. No self-joins, no per-stage subqueries: the classic
    funnel anti-pattern (stage tables joined N-1 times) is N shuffles of
    the fact table; this is one."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    as_cnt = lambda c, n: F.sum(c.cast("long")).alias(n)  # noqa: E731
    return f.agg(
        as_cnt(stage1, "n_view"),
        as_cnt(stage2, "n_view_click"),
        as_cnt(stage3, "n_full_funnel"),
    )


# --- Time-series gap fill ----------------------------------------------
_GAP_FILL_ORACLE = """
WITH span AS (
  SELECT user_id, date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
  FROM events GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
), daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT s.user_id, epoch_ms(s.day)::BIGINT AS day_ms,
       CAST(coalesce(d.cnt, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, day_ms
"""


@query("timeseries_gap_fill", oracle=_GAP_FILL_ORACLE)
def q_timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-fill missing days per user: explode each user's own
    [first_day, last_day] spine (``sequence`` + ``explode``) and left-join
    the daily counts. The spine is generated from the per-user span agg —
    rows produced scale with Σ user-span-days, not users × global-calendar;
    and both the spine and the counts are keyed on user_id so the join
    co-partitions after one shuffle each."""
    ev = _t(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.unix_millis("day").alias("day_ms"),
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "day_ms")
    )


# --- Trailing-window z-score anomalies ---------------------------------
# Flag events whose value is > 2.5 sample-stddevs from the mean of the
# user's 20 strictly-preceding events (full windows only). z is rounded to
# 4 decimals: avg/stddev accumulate in row order in both engines, but the
# online algorithms differ in the last ulps.
_ZSCORE_ORACLE = ZSCORE_ORACLE


@query("zscore_anomalies", oracle=_ZSCORE_ORACLE)
def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: bounded ROWS frame (20
    trailing events) per user — state is O(frame) per key, the shape that
    ports directly to a stateful streaming operator. One shuffle on
    user_id; the frame excludes the current row so the score is a true
    out-of-sample deviation."""
    ev = _t(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.avg("value").over(win)) / F.stddev_samp("value").over(win)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("zscore"),
            F.count(F.lit(1)).over(win).alias("n_prior"),
            F.stddev_samp("value").over(win).alias("sigma"),
            z.alias("z_raw"),
        )
        .filter((F.col("n_prior") == 20) & (F.col("sigma") > 0) & (F.abs("z_raw") > 2.5))
        .select("event_id", "user_id", "value", "zscore")
        .orderBy("event_id")
    )


# --- Equi-width histogram ----------------------------------------------
# Manual bucketing (floor((v-lo)*n/(hi-lo)) clamped) instead of
# width_bucket so both engines run the identical double-precision
# expression.
_HISTOGRAM_ORACLE = """
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT CAST(least(19, floor((o_totalprice - lo) * 20 / (hi - lo))) AS BIGINT)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS bucket_value
FROM orders, b
GROUP BY 1
ORDER BY 1
"""


@query("histogram_totalprice", oracle=_HISTOGRAM_ORACLE)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of order totals: pass 1 computes the
    (lo, hi) range (scalar agg), pass 2 broadcasts that single row and
    buckets per-row — the textbook two-pass histogram; at 100 TB both
    passes are map-side-combined scans with no wide shuffle beyond the
    20-group final agg."""
    orders = _t(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.lit(19),
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo"))
        ),
    ).cast("bigint")
    return (
        orders.join(F.broadcast(b))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("bucket_value"),
        )
        .orderBy("bucket")
    )


# --- Table profiling ----------------------------------------------------
# One stacked profile row per column: null count, distinct count, numeric
# min/max (NULL for varchar columns), lexical min/max (NULL for numerics).
_PROFILE_COLS_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_PROFILE_COLS_STR = ["o_orderstatus", "o_orderpriority"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       round(min({c}) :: DOUBLE, 6) AS min_num,
       round(max({c}) :: DOUBLE, 6) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders"""
    for c in _PROFILE_COLS_NUM
) + "\nUNION ALL\n" + "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       min({c}) AS min_str, max({c}) AS max_str
FROM orders"""
    for c in _PROFILE_COLS_STR
) + "\nORDER BY col_name"


@query("table_profile_orders", oracle=_PROFILE_ORACLE)
def q_table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling sweep (the ingestion-QA step of a training-data
    pipeline): per-column null/distinct/min/max in a SINGLE aggregation
    pass — all columns' stats are computed in one scan and then unpivoted
    to (col_name, stats) rows driver-side-free via a tiny stack expr. The
    naive per-column UNION of scans reads the table N times; this reads it
    once."""
    from ..operators.parallelism import spread_fanout

    # Five countDistinct aggregates expand the input ×6 (Expand node)
    # before the partial agg, all inside the 1-split scan stage — re-spread
    # so the expand+partial-agg uses every core (no-op when wide).
    orders = spread_fanout(_t(spark, sf_dir, "orders"))
    aggs = []
    for c in _PROFILE_COLS_NUM + _PROFILE_COLS_STR:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    for c in _PROFILE_COLS_NUM:
        aggs += [
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min_num"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max_num"),
        ]
    for c in _PROFILE_COLS_STR:
        aggs += [F.min(c).alias(f"{c}__min_str"), F.max(c).alias(f"{c}__max_str")]
    stats = orders.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in _PROFILE_COLS_NUM:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min_num").alias("min_num"),
                F.col(f"{c}__max_num").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
            )
        )
    for c in _PROFILE_COLS_STR:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                null_d.alias("min_num"),
                null_d.alias("max_num"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
        )
    return (
        stats.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


# --- Pareto frontier ----------------------------------------------------
# Skyline over (earliest order date, highest total price): a date is on
# the frontier iff its max price beats every strictly-earlier date's max.
_PARETO_ORACLE = """
WITH dmax AS (
  SELECT o_orderdate AS d, max(o_totalprice) AS mp FROM orders GROUP BY 1
), run AS (
  SELECT d, mp,
         max(mp) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prior_max
  FROM dmax
)
SELECT epoch_ms(d)::BIGINT AS date_ms, round(mp, 2) AS frontier_price
FROM run
WHERE prior_max IS NULL OR mp > prior_max
ORDER BY date_ms
"""


@query("pareto_frontier_orders", oracle=_PARETO_ORACLE)
def q_pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline without the O(n²) dominance join: collapse to per-date
    max (keyed agg), then one running-max window over dates — O(n log n)
    and shuffle-bounded by the number of DISTINCT dates, not rows. The
    window is a single global ordering over the collapsed (tiny) date set,
    so the notorious single-partition window problem applies to |dates|,
    not |orders|."""
    orders = _t(spark, sf_dir, "orders")
    dmax = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("mp")
    )
    win = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    return (
        dmax.withColumn("prior_max", F.max("mp").over(win))
        .filter(F.col("prior_max").isNull() | (F.col("mp") > F.col("prior_max")))
        .select(
            F.unix_millis("d").alias("date_ms"),
            F.round("mp", 2).alias("frontier_price"),
        )
        .orderBy("date_ms")
    )


# --- Salted two-phase aggregation --------------------------------------
_SALTED_ORACLE = """
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY 1
"""


def q_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEREGISTERED r19 (the post-saturation swap worked example,
    executed): the driver slot moved to ``mg_heavy_hitters_topk``
    (llm_text.py). This row was the lowest-marginal-value member of the
    r19-critical cohort — a performance-technique demonstration whose
    correctness content (salted composition ≡ plain aggregation) is an
    invariant, not query semantics; the salting family stays
    driver-gated through ``salted_skew_join_revenue`` and THIS function
    keeps its full oracle + no-cartesian plan pin in
    tests/test_deregistered_gates.py.

    Skew-safe aggregation made explicit: revenue per order priority via
    salt → partial agg on (key, salt) → final agg on key. With only 5
    priority values, a direct groupBy funnels the whole fact table through
    5 reducers; salting fans the partial state across 32×5 groups and the
    final agg combines 160 tiny rows. Spark's partial aggregation usually
    does this implicitly — the explicit form is the pinned recipe for
    pathological key skew (and for engines/modes without map-side combine),
    and the oracle proves it is semantically invisible."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(32))
    )
    partial = joined.groupBy("o_orderpriority", "salt").agg(
        F.sum("rev").alias("rev_part"), F.count(F.lit(1)).alias("n_part")
    )
    return (
        partial.groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("rev_part"), 2).alias("revenue"),
            F.sum("n_part").alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


# --- CEP-style sequence pattern detection ------------------------------
# Flink's CEP library (relaxed contiguity, `followedBy`): match
# view -> click -> purchase per user where each step follows the previous
# within 10 minutes (other events may interleave). Expressed as chained
# "last qualifying predecessor" analytic windows — no joins over the fact
# table, no state machine.
_CEP_ORACLE = CEP_FUNNEL_ORACLE


@query("cep_funnel_sequences", oracle=_CEP_ORACLE)
def q_cep_funnel_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern matching (Flink CEP ``begin.followedBy.followedBy``
    with a 10-minute within-clause, relaxed contiguity) WITHOUT a state
    machine: each step's 'last qualifying predecessor' is a conditional
    running max over the user's event sequence, chained through two
    analytic passes that reuse ONE user_id sort/exchange. The only join
    is pattern-match rows back to the (tiny) qualifying-click set to
    recover the view timestamp. At 100 TB this is two window passes over
    a single hash partitioning — the NFA approach shuffles nothing less
    and keeps per-key state besides."""
    ev = _t(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ten_min = F.expr("INTERVAL 10 MINUTES")
    o = ev.withColumn(
        "last_view",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(seq),
    )
    click_qual = (
        (F.col("event_type") == "click")
        & F.col("last_view").isNotNull()
        & (F.col("ts") <= F.col("last_view") + ten_min)
    )
    o2 = o.withColumn(
        "last_qual_click", F.max(F.when(click_qual, F.col("ts"))).over(seq)
    )
    clicks = (
        o.filter(click_qual)
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("last_view").alias("view_ts"))
    )
    matched = o2.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_qual_click").isNotNull()
        & (F.col("ts") <= F.col("last_qual_click") + ten_min)
    )
    return (
        matched.join(
            clicks,
            (matched.user_id == clicks.user_id)
            & (matched.last_qual_click == clicks.click_ts),
        )
        .select(
            matched.user_id,
            F.col("event_id").alias("purchase_id"),
            F.unix_millis("view_ts").alias("view_ms"),
            F.unix_millis("last_qual_click").alias("click_ms"),
            F.unix_millis(matched.ts).alias("purchase_ms"),
        )
        .orderBy("user_id", "purchase_id")
    )


# --- Event-transition (Markov) matrix ----------------------------------
_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
       round(count(*)::DOUBLE
             / sum(count(*)) OVER (PARTITION BY src), 6) AS p
FROM seq WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
"""


@query("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    one lead() pass on the user_id partitioning, then a 25-cell agg; the
    row-normalizing denominator is an analytic sum over the aggregated
    (≤ |types|²) cells, not a second fact-table pass."""
    ev = _t(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(seq).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy("src")
    return (
        pairs.withColumn(
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(total), 6)
        )
        .orderBy("src", "dst")
    )


# --- Exponentially-weighted moving average -----------------------------
# ewma_1 = x_1; ewma_k = 0.2·x_k + 0.8·ewma_{k-1} per user in (ts,
# event_id) order. Inherently sequential per key — the oracle is a
# DuckDB recursive CTE; the engine side runs the IDENTICAL double
# recursion (same operand order → bit-equal) inside applyInPandas.
_EWMA_ORACLE = EWMA_ORACLE


def _ewma_partition(it):
    """Partition-local EWMA: buffer the partition's chunks, one sort, then
    the oracle's exact recursion per key segment (same operand order →
    bit-equal doubles). One Python call per PARTITION, not per key — the
    shape that survives millions of tiny keys (cf. user_trend_partition_
    local); memory is bounded by one partition, the same envelope any
    sort-based operator holds."""
    import numpy as np
    import pandas as pd

    chunks = [pdf for pdf in it if not pdf.empty]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        ["user_id", "ts", "event_id"]
    )
    u = pdf["user_id"].to_numpy()
    vals = pdf["value"].to_numpy()
    out = vals.copy()
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    bounds = np.append(starts, len(u))
    for a, b in zip(bounds[:-1], bounds[1:]):
        for i in range(a + 1, b):  # the oracle's recursion, same order
            out[i] = 0.2 * vals[i] + 0.8 * out[i - 1]
    yield pd.DataFrame(
        {
            "user_id": u,
            "event_id": pdf["event_id"].to_numpy(),
            "value": vals.round(6),
            "ewma": out.round(6),
        }
    )


@query("ewma_smoothing", oracle=_EWMA_ORACLE)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=0.2) — the canonical inherently-sequential
    per-key computation: no window frame expresses it (each output feeds
    the next) and the closed-form rewrite ((1-α)^-k weights) overflows on
    long series, so the right distributed shape is applyInPandas — keys
    fan out across executors, each key's series runs its O(n) recursion
    locally in Arrow-batched numpy. Same parallelism profile as
    sessionization: bounded by the longest single-key series, which is
    exactly the constraint the math imposes."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out_schema = "user_id bigint, event_id bigint, value double, ewma double"
    # Partition count derived from the session, not a constant tuned for
    # one machine: per-user results are partition-count invariant (each
    # user's series lands whole in one partition and runs its own exact
    # recursion), so this only sets parallelism — scale-adaptive per the
    # driver's lower-core bench runs and any real cluster.
    n_parts = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(n_parts, "user_id")
        .mapInPandas(_ewma_partition, out_schema)
        .orderBy("user_id", "event_id")
    )


# --- PageRank over the customer-supplier graph -------------------------
# Symmetrized bipartite graph: customer c and supplier s are linked iff s
# supplied a line item of one of c's orders. 3 iterations, d = 0.85,
# per-iteration 6-decimal rounding pins the order-dependent ulps (see
# operators/graph.py).
_PAGERANK_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
), deg AS (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
), n AS (
  SELECT count(*)::DOUBLE AS nn FROM nodes
), pr0 AS (
  SELECT node, 1.0 / nn AS pr FROM nodes, n
), it1 AS (
  SELECT e.dst AS node, round(0.15 / any_value(n.nn) + 0.85 * sum(p.pr / d.outdeg), 6) AS pr
  FROM edges e JOIN deg d ON e.src = d.src JOIN pr0 p ON e.src = p.node, n
  GROUP BY e.dst
), it2 AS (
  SELECT e.dst AS node, round(0.15 / any_value(n.nn) + 0.85 * sum(p.pr / d.outdeg), 6) AS pr
  FROM edges e JOIN deg d ON e.src = d.src JOIN it1 p ON e.src = p.node, n
  GROUP BY e.dst
)
SELECT e.dst AS node, round(0.15 / any_value(n.nn) + 0.85 * sum(p.pr / d.outdeg), 6) AS pr
FROM edges e JOIN deg d ON e.src = d.src JOIN it2 p ON e.src = p.node, n
GROUP BY e.dst
ORDER BY node
"""


@query("pagerank_customer_supplier", oracle=_PAGERANK_ORACLE)
def q_pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the symmetrized
    customer–supplier bipartite graph — the second workhorse iterative
    graph op beside connected components: one keyed join + one keyed agg
    per iteration (the Pregel shuffle profile), edge list and degrees
    materialized once, rank vector never leaves the executors. Node ids
    are packed into BIGINT (customer 2k / supplier 2k+1) — integer keys
    hash and shuffle several times cheaper than string-tagged ids at
    graph scale."""
    from ..operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionByName(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )
    return pagerank(edges, iters=3, damping=0.85).orderBy("node")


# --- Physical join-strategy control ------------------------------------
_HINT_JOIN_ORACLE = """
SELECT l.l_returnflag,
       round(sum(l.l_extendedprice), 2) AS gross,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@query("shuffle_hash_join_parity", oracle=_HINT_JOIN_ORACLE)
def q_shuffle_hash_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-strategy control: the same logical join pinned to
    SHUFFLE_HASH via a join hint — hash-build beats sort-merge when one
    side is much smaller after filtering but still too big to broadcast
    (no sort, no spill-prone merge). The oracle proves strategy choice is
    semantically invisible; `tests/test_plans.py` pins that the hint
    actually selects ShuffledHashJoin, so a Spark-version regression in
    hint handling fails loudly instead of silently falling back."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .hint("SHUFFLE_HASH")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


# --- CDC changelog materialization -------------------------------------
# The events stream read AS a change log keyed by user: signup/purchase
# upsert the user's state, error is a delete tombstone, view/click are
# non-state events and ignored. Materialized table = latest surviving op
# per key — the latest-row-plus-tombstone merge at the heart of every CDC
# sink (Debezium -> warehouse, Paimon/Hudi upsert tables).
_CDC_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, event_type, value, ts FROM events
  WHERE event_type IN ('signup', 'purchase', 'error')
), last AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM log
)
SELECT user_id, round(value, 6) AS last_value,
       epoch_ms(ts)::BIGINT AS updated_ms
FROM last
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_changelog_materialize", oracle=_CDC_ORACLE)
def q_cdc_changelog_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog -> table materialization: latest op per key wins, delete
    tombstones drop the key. One window pass on the key partitioning (the
    same shuffle a MERGE INTO target dedup costs); at warehouse scale this
    is the compaction step of every CDC ingestion pipeline, and rank-1
    selection (not max-ts join-back) keeps it a single exchange."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 6).alias("last_value"),
            F.unix_millis("ts").alias("updated_ms"),
        )
        .orderBy("user_id")
    )


# --- Mergeable-aggregate patterns --------------------------------------
# Incremental view maintenance: merge a base aggregate with a new-batch
# delta instead of recomputing — valid for any commutative-monoid agg
# state (count/sum/min/max here). The oracle is the full-recompute
# aggregate, so the gate proves base ⊕ delta ≡ recompute.
_INC_MERGE_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("incremental_agg_merge", oracle=_INC_MERGE_ORACLE)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the corpus is split at a date
    boundary into 'base' (already-materialized view state) and 'delta'
    (the new batch); each aggregates independently and the two states
    merge by monoid combination (sum of counts/sums, min of mins, max of
    maxes). The oracle recomputes from scratch — hash equality IS the
    algebraic proof that maintenance never needs the base table again,
    which at warehouse scale turns an O(history) refresh into O(batch)."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")

    def agg_state(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    base = agg_state(ev.filter(F.col("ts") < cut))
    delta = agg_state(ev.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
            F.round(F.min("min_value"), 6).alias("min_value"),
            F.round(F.max("max_value"), 6).alias("max_value"),
        )
        .orderBy("event_type")
    )


# HLL sketch merge: per-day sketches unioned into one estimate — the
# mergeability that makes sketch state distributable (partial sketches
# per partition/day, union at the coordinator). Bound-checked oracle
# (exact distinct + in-bound flag), like approx_distinct_bounds.
_HLL_MERGE_ORACLE = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merged_within_5pct
FROM events
"""


@query("hll_sketch_merge_bounds", oracle=_HLL_MERGE_ORACLE)
def q_hll_sketch_merge_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE as a first-class op: one HLL sketch per day (the
    partial-aggregation shape — at scale each partition/day builds its
    sketch independently), then hll_union_agg collapses them to the
    corpus-wide distinct-user estimate. The estimate from merged daily
    sketches must land within 5% of exact — proving union loses no
    precision class, the property that lets sketch state ship across
    stages/days instead of raw keys."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("day_exact"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        exact.join(F.broadcast(merged))
        .select(
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_5pct"),
        )
    )


# --- Equi-depth histogram ----------------------------------------------
_EQUI_DEPTH_ORACLE = """
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM t
GROUP BY bucket
ORDER BY bucket
"""


@query("equi_depth_histogram", oracle=_EQUI_DEPTH_ORACLE)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets — the companion of the
    equi-width `histogram_totalprice`, and the statistic a CBO actually
    wants for skewed columns): ntile(10) with a deterministic tiebreak,
    then per-bucket bounds. The global ntile is the textbook
    single-partition window hazard — at 100 TB this exact output comes
    from approx_percentile cut points + the two-pass bucket-assign
    (`histogram_totalprice`'s shape); the ntile form is kept as the exact
    semantic (and its oracle), sized to the distinct-value scale where a
    global window is affordable."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_orders", "lo", "hi")
        .orderBy("bucket")
    )


# --- Session-scoped funnel ---------------------------------------------
# Composition: sessionize (10-min gap, the gaps-and-islands pass) then
# run the min-time ordered funnel WITHIN each session — "did this visit
# convert", the form product analytics actually ships.
_SESSION_FUNNEL_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTES
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
), f AS (
  SELECT user_id, sess_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM s GROUP BY user_id, sess_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
            AS BIGINT) AS n_view_click,
       CAST(count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click)
            AS BIGINT) AS n_converted
FROM f
"""


@query("session_funnel_conversion", oracle=_SESSION_FUNNEL_ORACLE)
def q_session_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel scoped to sessions: the gaps-and-islands sessionizer and
    the per-session stage pivot REUSE one user_id exchange (window, then
    groupBy on (user, session) — co-partitioned), ending in a scalar
    conditional count. Composition of two registry primitives with no
    extra shuffle over either alone."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.lag("ts").over(wseq).isNull()
        | (F.col("ts") >= F.lag("ts").over(wseq) + F.expr("INTERVAL 10 MINUTES"))
    ).cast("long")
    s = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(wseq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    f = s.groupBy("user_id", "sess_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return f.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(stage1.cast("long")).alias("n_view"),
        F.sum(stage2.cast("long")).alias("n_view_click"),
        F.sum(stage3.cast("long")).alias("n_converted"),
    )


# --- Week-over-week revenue delta --------------------------------------
_WOW_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate) AS wk,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT epoch_ms(wk)::BIGINT AS week_ms, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY wk), 2) AS wow_delta,
       round(100.0 * (revenue - lag(revenue) OVER (ORDER BY wk))
             / lag(revenue) OVER (ORDER BY wk), 4) AS wow_pct
FROM weekly
ORDER BY week_ms
"""


@query("weekly_revenue_wow", oracle=_WOW_ORACLE)
def q_weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly revenue with lag deltas. The
    global-ordering window runs over the COLLAPSED weekly series (|weeks|
    rows), not the fact table — aggregate first, window the small result;
    first week's deltas are NULL by lag semantics on both engines."""
    orders = _t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").alias("wk")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("wk")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        F.unix_millis("wk").alias("week_ms"),
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("wow_delta"),
        F.round(F.lit(100.0) * (F.col("revenue") - prev) / prev, 4).alias("wow_pct"),
    ).orderBy("week_ms")


# --- ABC / Pareto classification ---------------------------------------
_ABC_ORACLE = """
WITH p AS (
  SELECT l_partkey, round(sum(l_extendedprice), 2) AS revenue
  FROM lineitem GROUP BY 1
), r AS (
  SELECT l_partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS running,
         sum(revenue) OVER () AS total
  FROM p
)
SELECT CASE WHEN running / total <= 0.5 THEN 'A'
            WHEN running / total <= 0.8 THEN 'B' ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(revenue), 2) AS class_revenue
FROM r
GROUP BY 1
ORDER BY abc_class
"""


@query("abc_pareto_classification", oracle=_ABC_ORACLE)
def q_abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue share: running
    cumulative share over the revenue-ranked parts, bucketed at 50%/80%.
    The running-sum window orders the AGGREGATED per-part series (with a
    deterministic tiebreak), not line items; the global total is a
    window-over-nothing on the same collapsed series. At true catalog
    scale the global ordering becomes a range-partitioned sort — same
    semantics, and the 2-pass structure is unchanged."""
    li = _t(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = p.select(
        "revenue",
        F.sum("revenue").over(w).alias("running"),
        F.sum("revenue").over(Window.partitionBy()).alias("total"),
    )
    cls = (
        F.when(F.col("running") / F.col("total") <= 0.5, "A")
        .when(F.col("running") / F.col("total") <= 0.8, "B")
        .otherwise("C")
    )
    return (
        r.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# --- Volume-anomaly days -----------------------------------------------
# Data-freshness/completeness monitoring: flag (event_type, day) cells
# whose volume deviates > 2σ from that type's other-days baseline
# (leave-one-out mean/std so a spike can't mask itself).
_VOLUME_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, day, n,
         (sum(n) OVER w - n) / (count(*) OVER w - 1) AS loo_mean,
         count(*) OVER w AS n_days
  FROM daily
  WINDOW w AS (PARTITION BY event_type)
), scored AS (
  SELECT s.event_type, s.day, s.n, s.loo_mean,
         sqrt(sum((d.n - s.loo_mean) * (d.n - s.loo_mean))
              / (s.n_days - 2)) AS loo_std
  FROM stats s JOIN daily d
    ON s.event_type = d.event_type AND s.day <> d.day
  GROUP BY s.event_type, s.day, s.n, s.loo_mean, s.n_days
)
SELECT event_type, epoch_ms(day)::BIGINT AS day_ms, n,
       round(loo_mean, 4) AS baseline,
       round((n - loo_mean) / loo_std, 4) AS deviation
FROM scored
WHERE loo_std > 0 AND abs((n - loo_mean) / loo_std) > 2
ORDER BY event_type, day_ms
"""


@query("volume_anomaly_days", oracle=_VOLUME_ANOMALY_ORACLE)
def q_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-health monitoring: daily volume per event type scored
    against a LEAVE-ONE-OUT baseline (the day under test is excluded from
    its own mean/std, so a single broken day can't normalize itself).
    Everything runs on the collapsed (type, day) grid — |types|·|days|
    rows — so the self-join for the LOO std is trivial at any fact-table
    scale; the fact table itself is touched once for the daily counts."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day",
        "n",
        ((F.sum("n").over(w) - F.col("n")) / (F.count(F.lit(1)).over(w) - 1)).alias(
            "loo_mean"
        ),
        F.count(F.lit(1)).over(w).alias("n_days"),
    )
    d2 = daily.select(
        F.col("event_type").alias("et2"), F.col("day").alias("day2"),
        F.col("n").alias("n2"),
    )
    scored = (
        stats.join(
            d2,
            (stats.event_type == d2.et2) & (stats.day != d2.day2),
        )
        .groupBy("event_type", "day", "n", "loo_mean", "n_days")
        .agg(
            F.sqrt(
                F.sum((F.col("n2") - F.col("loo_mean")) * (F.col("n2") - F.col("loo_mean")))
                / (F.col("n_days") - 2)
            ).alias("loo_std")
        )
    )
    dev = (F.col("n") - F.col("loo_mean")) / F.col("loo_std")
    return (
        scored.filter((F.col("loo_std") > 0) & (F.abs(dev) > 2))
        .select(
            "event_type",
            F.unix_millis("day").alias("day_ms"),
            "n",
            F.round("loo_mean", 4).alias("baseline"),
            F.round(dev, 4).alias("deviation"),
        )
        .orderBy("event_type", "day_ms")
    )


# --- Referential-integrity audit ---------------------------------------
_RI_AUDIT_ORACLE = """
SELECT 'lineitem_orphans' AS check_name,
       CAST(count(*) AS BIGINT) AS n_bad
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'order_customer_orphans',
       CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'customer_nation_orphans',
       CAST(count(*) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_nationkey IS NULL
UNION ALL
SELECT 'duplicate_order_keys',
       CAST(count(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
ORDER BY check_name
"""


@query("referential_integrity_audit", oracle=_RI_AUDIT_ORACLE)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-QA audit: orphaned foreign keys at every edge of the
    star schema plus key-uniqueness, as one stacked report. Each check is
    an anti-join (broadcast where the parent side is a dim); a healthy
    load reports all zeros — and the oracle proves the CHECKS themselves,
    not just the happy path, agree across engines."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey")

    def cnt(df):
        return df.agg(F.count(F.lit(1)).alias("n_bad"))

    checks = [
        (
            "lineitem_orphans",
            cnt(li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")),
        ),
        (
            "order_customer_orphans",
            cnt(orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")),
        ),
        (
            "customer_nation_orphans",
            cnt(
                cust.join(
                    F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey,
                    "left_anti",
                )
            ),
        ),
        (
            "duplicate_order_keys",
            cnt(
                orders.groupBy("o_orderkey")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
            ),
        ),
    ]
    out = None
    for name, df in checks:
        row = df.select(F.lit(name).alias("check_name"), "n_bad")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("check_name")


# --- Corpus length report ----------------------------------------------
_CORPUS_REPORT_ORACLE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
       round(avg(n_chars), 4) AS mean_chars
FROM documents
GROUP BY source
ORDER BY source
"""


@query("corpus_length_report", oracle=_CORPUS_REPORT_ORACLE)
def q_corpus_length_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile (the report every dataset card needs):
    doc counts, char mass, exact interpolated p50/p90 and mean. Exact
    percentiles per group — at true corpus scale the same report swaps
    in approx_percentile with a documented rank-error bound
    (approx_quantile_bounds is the gated pattern); the scan reads two
    columns."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
            F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        )
        .orderBy("source")
    )


# --- Keyed MERGE upsert (warehouse MERGE INTO emulation) ---------------
# The keyed-state sibling of incremental_agg_merge: materialize the
# target from the first 20 days' changelog, then MERGE the last 10 days'
# delta (update matched, insert new, delete tombstoned). The oracle is
# the CDC materialization over the FULL range — merge(base, delta) must
# equal recompute, the correctness contract of MERGE INTO pipelines.
_MERGE_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, event_type, value, ts FROM events
  WHERE event_type IN ('signup', 'purchase', 'error')
), last AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM log
)
SELECT user_id, round(value, 6) AS last_value,
       epoch_ms(ts)::BIGINT AS updated_ms
FROM last
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("keyed_merge_upsert", oracle=_MERGE_ORACLE)
def q_keyed_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on keyed state: target rows (latest per key
    from the base period, tombstones applied) full-outer-joined with the
    delta period's latest ops — delta wins where matched, inserts where
    new, deletes where its last op is a tombstone, target survives
    otherwise. One window pass per side + one keyed join; the oracle
    recomputes from the full changelog, so hash equality proves the merge
    law (merge(base, delta) ≡ recompute) that lets a warehouse apply
    day-sized deltas instead of replaying history."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest_ops(df):
        """Latest op per key INCLUDING tombstones (the merge needs to see
        deletes; dropping happens at apply time)."""
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value", "ts")
        )

    base = latest_ops(ev.filter(F.col("ts") < cut)).select(
        F.col("user_id").alias("b_user"),
        F.col("event_type").alias("b_op"),
        F.col("value").alias("b_value"),
        F.col("ts").alias("b_ts"),
    )
    delta = latest_ops(ev.filter(F.col("ts") >= cut)).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("d_op"),
        F.col("value").alias("d_value"),
        F.col("ts").alias("d_ts"),
    )
    merged = base.join(delta, base.b_user == delta.d_user, "full_outer")
    take_delta = F.col("d_user").isNotNull()
    alive = F.when(take_delta, F.col("d_op") != "error").otherwise(
        F.col("b_op") != "error"
    )
    return (
        merged.filter(alive)
        .select(
            F.coalesce("d_user", "b_user").alias("user_id"),
            F.round(
                F.when(take_delta, F.col("d_value")).otherwise(F.col("b_value")), 6
            ).alias("last_value"),
            F.unix_millis(
                F.when(take_delta, F.col("d_ts")).otherwise(F.col("b_ts"))
            ).alias("updated_ms"),
        )
        .orderBy("user_id")
    )


# --- Rolling 7-day active users (WAU) ----------------------------------
# DISTINCT-over-window isn't expressible as a window aggregate in either
# engine; the scalable formulation is the (user, day) grid joined to a
# trailing-7-day day spine — grid size is |users-active-days|, the
# fact table is touched once.
_WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), days AS (
  SELECT DISTINCT day FROM ud
)
SELECT epoch_ms(d.day)::BIGINT AS day_ms,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d
FROM days d
JOIN ud u ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAYS
GROUP BY d.day
ORDER BY day_ms
"""


@query("rolling_7d_active_users", oracle=_WAU_ORACLE)
def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct actives per day (WAU): the fact table
    collapses to the distinct (user, day) grid in one pass, then a
    bounded range join against the day spine re-counts each user at most
    7 times — the standard rewrite for distinct-over-sliding-window,
    which no engine's window frames support directly. At 100 TB the grid
    is ~|users|·|active days| ≪ events, and the range join is bounded by
    the 7-day band."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = ud.select(F.col("day").alias("d")).distinct()
    return (
        days.join(
            ud,
            (F.col("day") <= F.col("d"))
            & (F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.unix_millis("d").alias("day_ms"), "active_7d")
        .orderBy("day_ms")
    )
