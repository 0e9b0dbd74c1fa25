"""Mergeable bounded-domain histogram state — the quantile store of the
curation pipeline (r17 library capability, post-saturation policy: laws
+ hypothesis sweep + scale rung, no registry entry).

Quality gating at 100 TB ("keep the top 30% by quality score") needs a
quantile of a derived column whose domain is KNOWN by construction
(quality ∈ [0, 1], ratios, calibrated scores). For that regime the
honest structure is not a KLL/GK sketch (sequential compaction, a poor
fit for declarative plans) but a fixed-grid histogram: one map-side
bucketing pass + one keyed count aggregate, a LOSSLESS merge (vector
add — the third lossless-merge family here after HLL register-max and
bloom bit-or), and a rank guarantee that is CLOSED-FORM rather than
probabilistic: the true q-quantile provably lies inside the reported
bracket bin, so the value error is ≤ one bin width and the rank error
is ≤ the bracket bin's mass. 2^12 bins over [0, 1] bound the value
error at ~2.4e-4 for kilobytes of state.

State: SPARSE (bin_idx, n) rows — ≤ min(distinct values, bins)
regardless of corpus size; empty bins are never materialized.

LAWS (test-pinned in tests/test_histogram.py):
- lossless merge: state(A ∪ B) == merge(state(A), state(B)) exactly,
  for any sharding (counts add; nothing is approximated at merge time);
- mass conservation: total state mass == input row count (nulls
  excluded by contract, out-of-range values clamped into the end bins
  so mass is never silently dropped);
- bracket correctness: for every q, the exact q-quantile of the input
  lies within the reported bracket's [value_lo, value_hi] — pinned
  against a literal sort on the test data;
- rank sandwich: the bracket's cumulative bounds straddle q·n.

Reference parity note: the reference (StreamJob.java) has no quantile
surface — this belongs to the LLM-pipeline extension's curation arc
(the `quality_percentile_by_source` / `gopher_quality_rules` family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HIST_BINS = 1 << 12


def histogram_state(
    values: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = _HIST_BINS,
) -> DataFrame:
    """Bucket a value column over the known domain [lo, hi] into the
    sparse (bin_idx, n) state. Out-of-range values clamp into the end
    bins (mass is never dropped — a clamped tail is visible as end-bin
    mass, a silent drop would corrupt every rank downstream); nulls are
    the caller's filter. One projection + one keyed count: map-side
    partial, ≤ bins output rows."""
    if not hi > lo:
        raise ValueError(f"histogram domain must satisfy hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    idx = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long")
    clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
    return (
        values.select(clamped.alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two states: one keyed SUM. LOSSLESS (law-pinned): shards
    histogram independently and the merged state equals the single-pass
    state exactly — the store is never re-scanned."""
    return (
        a.unionByName(b)
        .groupBy("bin_idx")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def quantile_bracket(
    state: DataFrame,
    q: float,
    lo: float,
    hi: float,
    bins: int = _HIST_BINS,
) -> DataFrame:
    """The bracket bin of the q-quantile: a single row (bin_idx,
    value_lo, value_hi, cum_lo, cum_hi, total) such that the exact
    q-quantile of the histogrammed input lies in [value_lo, value_hi]
    (closed-form: the bin where the cumulative count first reaches
    ceil(q·n)). Runs as one window-cumsum over ≤ bins rows — the state,
    not the corpus. Degenerate inputs (empty state) yield zero rows."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    from pyspark.sql.window import Window

    width = (hi - lo) / bins
    w = Window.orderBy("bin_idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = state.select(
        "bin_idx", "n", F.sum("n").over(w).alias("cum_hi")
    ).select(
        "bin_idx",
        "n",
        (F.col("cum_hi") - F.col("n")).alias("cum_lo"),
        "cum_hi",
    )
    total = state.agg(F.sum("n").cast("long").alias("total"))
    target = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.lit(q) * F.col("total")).cast("long")
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .filter((F.col("cum_hi") >= target) & (F.col("cum_lo") < target))
        .select(
            "bin_idx",
            (F.lit(lo) + F.col("bin_idx") * F.lit(width)).alias("value_lo"),
            (F.lit(lo) + (F.col("bin_idx") + 1) * F.lit(width)).alias("value_hi"),
            "cum_lo",
            "cum_hi",
            "total",
        )
    )
