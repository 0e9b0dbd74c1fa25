"""Grouped-map applyInPandas query: per-user OLS trend of event value over
time, oracle-checked against DuckDB's regr_slope.

Completes the Python-lane surface: scalar vectorized pandas_udf
(`pandas_udf_vector_norms`), mapInPandas (`multimodal_feature_extract`),
applyInPandasWithState (`streaming_running_counts`), and now batch
grouped-map applyInPandas — each gated by an exact oracle. The grouped-map
lane is the one a real pipeline uses for per-key model fits (regressions,
seasonal decomposition) that built-in aggregates can't express; at scale
it's one shuffle on the grouping key and one Arrow batch per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table

_TREND_ORACLE = """
WITH x AS (
  SELECT user_id, value,
         (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id)) / 86400.0 AS xd
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(regr_slope(value, xd), 6) AS slope
FROM x GROUP BY user_id ORDER BY user_id
"""


def _fit_group(pdf):
    """OLS slope via the covariance formula — float64, same math as
    regr_slope (covar_pop/var_pop)."""
    import pandas as pd

    x = (pdf["ts"].astype("int64") / 1e9 - (pdf["ts"].astype("int64") / 1e9).min()) / 86400.0
    y = pdf["value"].astype("float64")
    xc = x - x.mean()
    denom = (xc**2).sum()
    slope = float((xc * (y - y.mean())).sum() / denom) if denom > 0 else None
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n_events": [len(pdf)], "slope": [slope]}
    )


@query("grouped_pandas_user_trend", oracle=_TREND_ORACLE)
def q_grouped_pandas_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = ev.groupBy("user_id").applyInPandas(
        _fit_group, "user_id long, n_events long, slope double"
    )
    return out.select(
        "user_id", "n_events", F.round("slope", 6).alias("slope")
    ).orderBy("user_id")
