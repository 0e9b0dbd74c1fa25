"""Temporal join queries: as-of join and interval join over the events
table.

These are capability-parity entries for the two stream-to-stream join shapes
Flink offers natively (``intervalJoin``; as-of enrichment via keyed state)
— SURVEY.md §2.6. Both oracles are exact: DuckDB has a native ASOF JOIN,
and the interval join is plain SQL with a BETWEEN predicate, so the bucketed
Spark implementations are hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import as_of_join, interval_join
from ..queries import query
from ..sources.batch import load_table

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
quotes AS (
  SELECT user_id, ts, max(value) AS value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, epoch_ms(c.ts)::BIGINT AS ts_ms,
       epoch_ms(q.ts)::BIGINT AS asof_ts_ms,
       round(q.value, 6) AS asof_value
FROM clicks c ASOF JOIN quotes q
  ON c.user_id = q.user_id AND c.ts >= q.ts
ORDER BY event_id
"""


@query("asof_join_latest_view", oracle=_ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's most recent view at-or-before the
    click (the latest-quote pattern). Spark path: union + marker + running
    last(ignorenulls) over (user, time) — one shuffle, no range join; the
    oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = as_of_join(
        clicks, views, key="user_id", right_value_cols=["value"], how="inner"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_millis("asof_ts").alias("asof_ts_ms"),
        F.round("asof_value", 6).alias("asof_value"),
    ).orderBy("event_id")


# Shared with the stream-stream twin in windows_extra (leaf home:
# _shared_oracles, per the r12 import-order contract).
from ._shared_oracles import INTERVAL_ORACLE as _INTERVAL_ORACLE  # noqa: E402


@query("interval_join_click_errors", oracle=_INTERVAL_ORACLE)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink intervalJoin analogue: every (click, error) pair for the same
    user within ±1 hour. Spark path: equi-join on (user, time-bucket) with
    bucket width = the 2-hour span (each click probes at most 2 buckets)
    plus the exact range filter — never a per-key cross product."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = interval_join(clicks, errors, key="user_id", lower_s=3600, upper_s=3600)
    return joined.select(
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("error_id"),
        F.col("l_user_id").alias("user_id"),
        F.round("r_value", 6).alias("error_value"),
    ).orderBy("click_id", "error_id")


_SCD2_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER win = 1
                OR event_type IS DISTINCT FROM lag(event_type) OVER win
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ver AS (
  SELECT user_id, ts, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM seq
),
runs AS (
  SELECT user_id, version, min(event_type) AS state,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM ver GROUP BY user_id, version
)
SELECT user_id, CAST(version AS BIGINT) AS version, state,
       epoch_ms(valid_from)::BIGINT AS valid_from_ms,
       epoch_ms(lead(valid_from) OVER wv)::BIGINT AS valid_to_ms,
       n_events,
       lead(valid_from) OVER wv IS NULL AS is_current
FROM runs WINDOW wv AS (PARTITION BY user_id ORDER BY version)
ORDER BY user_id, version
"""


@query("scd2_user_state", oracle=_SCD2_ORACLE)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the events change log:
    per user, consecutive same-event_type runs collapse to versioned
    [valid_from, valid_to) intervals, latest version open/is_current.
    The whole history build costs ONE exchange on user_id (change-flag
    window, running sum, per-run aggregate, and valid_to lead all reuse
    the partitioning — pinned in tests/test_plans.py). See
    operators/temporal.scd2_collapse."""
    from ..operators.temporal import scd2_collapse

    out = scd2_collapse(
        load_table(spark, sf_dir, "events"),
        key="user_id",
        attr="event_type",
        ts="ts",
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "version",
        "state",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        "n_events",
        "is_current",
    )


# As-of snapshot over the SCD2 history: the state of every user at one
# instant T — i.e., time travel against the versioned dimension. T is the
# corpus midpoint (2024-01-16) so the snapshot is non-trivial at every sf.
_SCD2_ASOF_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
               OR NOT (event_type IS NOT DISTINCT FROM lag(event_type) OVER w)
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), v AS (
  SELECT user_id, ts, event_type AS state,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM o
), runs AS (
  SELECT user_id, state, version, min(ts) AS valid_from
  FROM v GROUP BY user_id, state, version
), hist AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM runs
)
SELECT user_id, state,
       epoch_ms(valid_from)::BIGINT AS valid_from_ms
FROM hist
WHERE valid_from <= TIMESTAMP '2024-01-16 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-16 00:00:00')
ORDER BY user_id
"""


@query("scd2_asof_snapshot", oracle=_SCD2_ASOF_ORACLE)
def q_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel against the SCD2 dimension: one row per user giving the
    version valid at T (valid_from <= T < valid_to). Runs the same
    single-exchange history build and then a per-row interval predicate —
    no extra shuffle; at warehouse scale this is the query pattern that
    replaces full-table snapshots with interval filtering over the
    compacted history."""
    from ..operators.temporal import scd2_collapse

    t = F.lit("2024-01-16 00:00:00").cast("timestamp")
    hist = scd2_collapse(
        load_table(spark, sf_dir, "events"),
        key="user_id",
        attr="event_type",
        ts="ts",
        tiebreak="event_id",
    )
    return (
        hist.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .select(
            "user_id",
            "state",
            F.unix_millis("valid_from").alias("valid_from_ms"),
        )
        .orderBy("user_id")
    )


# --- Point-in-time feature join (feature-store training join) -----------

_PIT_ORACLE = """
WITH feat AS (
  SELECT user_id, ts, max_by(value, event_id) AS fval
  FROM events GROUP BY user_id, ts
), lab AS (
  SELECT event_id, user_id, ts FROM events WHERE event_id % 10 = 0
)
SELECT l.event_id, l.user_id,
       epoch_ms(f.ts) AS feat_ts_ms,
       round(f.fval, 6) AS feat_value
FROM lab l LEFT JOIN LATERAL (
  SELECT ts, fval FROM feat f
  WHERE f.user_id = l.user_id AND f.ts <= l.ts - INTERVAL 1 HOUR
  ORDER BY f.ts DESC LIMIT 1
) f ON true
ORDER BY l.event_id
"""


@query("point_in_time_feature_join", oracle=_PIT_ORACLE)
def q_point_in_time_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time training join with a 1-hour embargo:
    each label row (every 10th event) gets the user's most recent feature
    value as of ``label_ts - 1h`` — never newer (leakage) and never inside
    the embargo window (label-proximate contamination). Same single
    union-marker window pass as the as-of join (one shuffle on user_id, no
    range join); features are pre-deduplicated per (user, ts) with a
    deterministic max_by tiebreak, the precondition ``as_of_join``
    documents."""
    from ..operators.temporal import as_of_join

    ev = load_table(spark, sf_dir, "events")
    feat = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("fval")
    )
    lab = ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("cutoff"),
    )
    j = as_of_join(
        lab, feat, key="user_id", left_ts="cutoff", right_ts="ts",
        right_value_cols=["fval"], how="left",
    )
    return j.select(
        "event_id",
        "user_id",
        (F.unix_micros("asof_ts") / 1000).cast("bigint").alias("feat_ts_ms"),
        F.round("asof_fval", 6).alias("feat_value"),
    ).orderBy("event_id")
