"""Reference-parity queries (SURVEY.md §2.3-2.5): the flagship windowed
metrics aggregate over the ``events`` stand-in stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.window_metrics import EVENT_TYPE_RATES, window_metrics_over_events
from ..queries import query
from ..sources.batch import load_table

# Shared CASE fragment: event_type -> exchange rate (mirrors
# RemittanceGenerator.java:65-74's currency map; 'error' is the CNY-style
# zero-rate poison).
RATE_CASE_SQL = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN {v!r}" for k, v in EVENT_TYPE_RATES.items())
    + " ELSE 1.0 END"
)

_WINDOW_METRICS_ORACLE = f"""
WITH tx AS (
  SELECT value AS amount, {RATE_CASE_SQL} AS rate, ts FROM events
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


@query("window_metrics", oracle=_WINDOW_METRICS_ORACLE)
def q_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 10 s tumbling event-time window metrics (A1-A5,
    StreamJob.java:109-173)."""
    return window_metrics_over_events(load_table(spark, sf_dir, "events"))
