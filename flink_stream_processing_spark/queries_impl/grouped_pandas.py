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
    regr_slope (covar_pop/var_pop). Pure numpy inside the group: with many
    small groups the per-group pandas Series machinery dominates, and numpy
    ufuncs cut the per-group cost several-fold."""
    import numpy as np
    import pandas as pd

    t = pdf["ts"].to_numpy("datetime64[ns]").astype("int64") / 1e9
    x = (t - t.min()) / 86400.0
    y = pdf["value"].to_numpy(np.float64)
    xc = x - x.mean()
    denom = float((xc * xc).sum())
    slope = float((xc * (y - y.mean())).sum() / denom) if denom > 0 else None
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n_events": [len(pdf)], "slope": [slope]}
    )


@query("grouped_pandas_user_trend", oracle=_TREND_ORACLE)
def q_grouped_pandas_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical grouped-map lane: groupBy().applyInPandas, one Python
    call per group. CORRECT at any group count, but with MANY SMALL groups
    the per-group Arrow/pandas machinery dominates (~5 ms/group regardless
    of size) — so this entry is the semantics/verification path, and the
    headline-benched twin `user_trend_partition_local` computes the same
    result with one call per PARTITION. Use applyInPandas when per-group
    work is real (model fits on thousands+ of rows per key); use the
    partition-local pattern when keys are small and numerous."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = ev.groupBy("user_id").applyInPandas(
        _fit_group, "user_id long, n_events long, slope double"
    )
    return out.select(
        "user_id", "n_events", F.round("slope", 6).alias("slope")
    ).orderBy("user_id")


def _fit_partition(it):
    """All groups of a hash-partition in ONE Python call: pandas groupby
    with closed-form per-group sums (n, Σx, Σy, Σxy, Σx²) — fully
    vectorized, no per-group Python dispatch. slope = covar_pop/var_pop,
    identical math to _fit_group and regr_slope.

    A user's rows can span multiple Arrow chunks of the iterator (one chunk
    per ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows), so partial
    sums are accumulated across ALL chunks and emitted once after the loop.
    OLS slope is invariant to a shift in x, so each user's x offset is its
    first-seen timestamp (pinned on first appearance and reused for later
    chunks) — numerically as stable as the global min without a second pass.
    Degenerate groups (var_pop(x) == 0) emit NULL, matching regr_slope."""
    import numpy as np
    import pandas as pd

    acc = None  # per-user partial sums across chunks
    t0 = pd.Series(dtype=np.float64)  # per-user x offset (first-seen min ts)
    for pdf in it:
        if pdf.empty:
            continue
        t = pdf["ts"].to_numpy("datetime64[ns]").astype("int64") / 1e9
        d = pd.DataFrame({"user_id": pdf["user_id"].to_numpy(), "t": t,
                          "y": pdf["value"].to_numpy(np.float64)})
        chunk_t0 = d.groupby("user_id", sort=False)["t"].min()
        new_users = chunk_t0.index.difference(t0.index)
        if len(new_users):
            t0 = pd.concat([t0, chunk_t0.loc[new_users]])
        d["x"] = (d["t"] - d["user_id"].map(t0).to_numpy()) / 86400.0
        d["xy"] = d["x"] * d["y"]
        d["xx"] = d["x"] * d["x"]
        g = d.groupby("user_id", sort=False).agg(
            n=("y", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"),
        )
        acc = g if acc is None else acc.add(g, fill_value=0.0)
    if acc is None:
        return
    denom = acc["sxx"] - acc["sx"] * acc["sx"] / acc["n"]
    slope = (acc["sxy"] - acc["sx"] * acc["sy"] / acc["n"]) / denom
    # NULL (not NaN) for degenerate groups — regr_slope/NULL semantics.
    slope = slope.astype(object).where(denom > 0, None)
    yield pd.DataFrame({
        "user_id": acc.index.to_numpy(),
        "n_events": acc["n"].to_numpy("int64"),
        "slope": slope,
    })


@query("user_trend_partition_local", oracle=_TREND_ORACLE)
def q_user_trend_partition_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-user OLS trend, computed with repartition(key) +
    mapInPandas and an in-partition vectorized groupby — one Python call
    per partition instead of per group. This is the shape that survives
    100 TB with millions of tiny keys; hash-checked against the same
    regr_slope oracle as the applyInPandas twin."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # Session-derived partition count (was a hard-coded 32): per-user OLS
    # partials are exact sums folded per user within one partition, so the
    # count only sets parallelism — scale-adaptive for the driver's
    # lower-core runs and real clusters alike.
    out = ev.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    ).mapInPandas(_fit_partition, "user_id long, n_events long, slope double")
    return out.select(
        "user_id", "n_events", F.round("slope", 6).alias("slope")
    ).orderBy("user_id")
