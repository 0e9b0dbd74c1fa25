"""Reference-parity queries (SURVEY.md §2.3-2.5): the flagship windowed
metrics aggregate over the ``events`` stand-in stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from ..operators.json_ops import parse_json, roundtrip_json
from ..operators.risk import format_risk_lines, label_risk
from ..operators.window_metrics import as_transactions, window_metrics_over_events
from ..queries import query
from ..schemas import PROPS_SCHEMA
from ..sources.batch import load_table

# The rate CASE fragment and the flagship window-metrics oracle live in
# _shared_exprs (built from EVENT_TYPE_RATES, the RemittanceGenerator
# currency map) — windows_extra's streaming twin consumes the same text.
from ._shared_exprs import (
    RATE_CASE_SQL,  # noqa: F401  (re-export for parity readers)
    WINDOW_METRICS_ORACLE as _WINDOW_METRICS_ORACLE,
)


@query("window_metrics", oracle=_WINDOW_METRICS_ORACLE)
def q_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 10 s tumbling event-time window metrics (A1-A5,
    StreamJob.java:109-173)."""
    return window_metrics_over_events(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# P2 risk labeling (deterministic projection; wall-clock latency covered by
# streaming tests — nondeterministic by design, SURVEY.md §7 risk register).
# Threshold 100 splits the stand-in stream's value range [0.01, 490].
_RISK_ORACLE = """
SELECT CAST(event_id AS VARCHAR) AS transactionId,
       value AS amount,
       CASE WHEN value > 100 THEN 'RISK' ELSE 'SAFE' END AS risk_type
FROM events
"""


@query("risk_label", oracle=_RISK_ORACLE)
def q_risk_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: riskType = amount > threshold ? RISK : SAFE (StreamJob.java:67-78)."""
    tx = as_transactions(load_table(spark, sf_dir, "events"))
    return label_risk(tx, threshold=100.0, with_latency=False).select(
        "transactionId", "amount", "risk_type"
    )


# P3 format-string print-sink line (StreamJob.java:82-89).
_FORMAT_ORACLE = """
SELECT CAST(event_id AS VARCHAR) AS transactionId,
       printf('TxId=%s, Amount=%.2f, Risk=%s',
              CAST(event_id AS VARCHAR), round(value, 2),
              CASE WHEN value > 100 THEN 'RISK' ELSE 'SAFE' END) AS line
FROM events
"""


@query("risk_format_lines", oracle=_FORMAT_ORACLE)
def q_risk_format_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = as_transactions(load_table(spark, sf_dir, "events"))
    return format_risk_lines(
        label_risk(tx, threshold=100.0, with_latency=False), with_latency=False
    )


# P1 JSON parse: events.props is a JSON payload ('{"k": <int>}').
_JSON_PARSE_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY event_type
"""


@query("json_parse_props", oracle=_JSON_PARSE_ORACLE)
def q_json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: from_json string->typed (StreamJob.java:61,:101), then aggregate."""
    ev = load_table(spark, sf_dir, "events")
    parsed = parse_json(ev, "props", PROPS_SCHEMA)
    return parsed.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("sum_k"),
        F.count(F.lit(1)).alias("cnt"),
    )


# P4+P5 JSON round-trip of the window-metrics aggregate
# (StreamJob.java:150-188): serialize -> parse must be lossless, so the
# oracle is the window_metrics oracle itself.
_METRIC_JSON_SCHEMA = StructType(
    [
        StructField("window_start", LongType()),
        StructField("window_end", LongType()),
        StructField("cnt", LongType()),
        StructField("success_count", LongType()),
        StructField("failure_count", LongType()),
        StructField("avg_amount", DoubleType()),
        StructField("avg_exchange_rate", DoubleType()),
        StructField("min_amount", DoubleType()),
        StructField("max_amount", DoubleType()),
    ]
)


@query("json_roundtrip_metrics", oracle=_WINDOW_METRICS_ORACLE)
def q_json_roundtrip_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    metrics = window_metrics_over_events(load_table(spark, sf_dir, "events"))
    return roundtrip_json(metrics, list(metrics.columns), _METRIC_JSON_SCHEMA)


def _generator_oracle() -> str:
    """DuckDB recomputation of the ENTIRE generator -> window-metrics
    chain: the same seeded-md5 field synthesis (see
    sources/generator.py:_h) over range(1000), then the 8-metric tumbling
    aggregate — so the synthetic source itself is oracle-gated, not just
    queries over pre-built tables."""
    from ..operators.window_metrics import EVENT_TYPE_RATES  # noqa: F401 (parity ref)
    from ..schemas import CURRENCIES, EXCHANGE_RATES

    def h(seed: int, n_hex: int = 8) -> str:
        return (
            f"cast('0x' || substr(md5('{seed}:' || CAST(i AS VARCHAR)), 1, {n_hex}) AS BIGINT)"
        )

    rate_case = (
        f"CASE ({h(3)} % {len(CURRENCIES)}) "
        + " ".join(
            f"WHEN {idx} THEN {EXCHANGE_RATES[cur]!r}" for idx, cur in enumerate(CURRENCIES)
        )
        + " ELSE 0.0 END"
    )
    return f"""
WITH tx AS (
  SELECT {h(4, 13)} / {float(1 << 52)!r} AS amount,
         {rate_case} AS rate,
         TIMESTAMP '2024-01-01 00:00:00' + to_milliseconds(i * 2000) AS ts
  FROM range(0, 1000) t(i)
)
SELECT
  epoch_ms(time_bucket(INTERVAL 10 SECONDS, ts)) AS window_start,
  epoch_ms(time_bucket(INTERVAL 10 SECONDS, ts)) + 10000 AS window_end,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
  CAST(sum(CASE WHEN rate <> 0 THEN 0 ELSE 1 END) AS BIGINT) AS failure_count,
  round(coalesce(sum(CASE WHEN rate <> 0 THEN amount END)
        / nullif(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END), 0), 0.0), 6) AS avg_amount,
  round(coalesce(sum(CASE WHEN rate <> 0 THEN rate END)
        / nullif(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END), 0), 0.0), 6) AS avg_exchange_rate,
  coalesce(min(CASE WHEN rate <> 0 THEN amount END), 0.0) AS min_amount,
  coalesce(max(CASE WHEN rate <> 0 THEN amount END), 0.0) AS max_amount
FROM tx
GROUP BY 1
"""


@query("generator_transactions", oracle=_generator_oracle())
def q_generator_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the deterministic batch variant of the rate-source generator
    (RemittanceGenerator.java:31-63) feeding the flagship aggregate —
    generator -> window metrics end to end, with the synthesis itself
    recomputed by the oracle (seeded md5 in both engines)."""
    from ..operators.window_metrics import window_metrics
    from ..sources.generator import batch_transactions

    return window_metrics(batch_transactions(spark, 1000))


# S1/S2 + K4 wire format, brokerless: the sink's exact to_json(struct(*))
# serialization piped into the source's exact from_json parse over the
# transaction shape the events table adapts to. A hash match against the
# plain projection proves the Kafka value format round-trips losslessly —
# the only reference-surface Kafka path testable without a broker.
_KAFKA_WIRE_ORACLE = """
SELECT event_id, event_type, round(value, 6) AS amount, epoch_ms(ts) AS timestamp
FROM events
ORDER BY event_id
"""


@query("kafka_wire_roundtrip", oracle=_KAFKA_WIRE_ORACLE)
def q_kafka_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StructType as _St

    from ..sources.kafka import transaction_wire_value

    wire_schema = _St(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("amount", DoubleType()),
            StructField("timestamp", LongType()),
        ]
    )
    from ..operators.parallelism import spread_fanout

    # to_json + from_json per row off a 1-split scan — re-spread so the
    # serde round-trip uses every core (no-op when the input is wide).
    ev = spread_fanout(
        load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("amount"),
            F.unix_millis("ts").alias("timestamp"),
        )
    )
    values = transaction_wire_value(ev)
    parsed = values.select(F.from_json(F.col("value"), wire_schema).alias("t"))
    return parsed.select("t.*").orderBy("event_id")
