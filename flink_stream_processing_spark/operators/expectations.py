"""Declarative data-quality expectations compiled into ONE aggregation
pass (a mini Great-Expectations for the ingestion-QA stage): callers give
a rule list, the compiler emits a single ``agg`` whose outputs unpivot to
one (rule, column, n_violations, passed) row each.

Scale design (100 TB): every rule becomes a conditional-count aggregate in
the SAME map-side-combined scan — N rules cost one pass, not N. The
``unique`` rule rides the same agg as ``count(col) - count(DISTINCT col)``
(Spark expands multi-distinct via one Expand — still a single scan);
pinpointing WHICH keys duplicate is a separate drill-down query, not the
report. The stacked report is O(rules) rows built by a literal struct
unpivot — nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple  # ("not_null", col) | ("unique", col) | ("range", col, lo, hi)
#              | ("accepted_values", col, [v1, v2, ...])


def _violation_expr(rule: Rule) -> F.Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if kind == "unique":
        return F.count(c) - F.countDistinct(c)
    if kind == "range":
        lo, hi = rule[2], rule[3]
        return F.count(F.when((c < F.lit(lo)) | (c > F.lit(hi)), 1))
    if kind == "accepted_values":
        return F.count(F.when(~c.isin(list(rule[2])), 1))
    raise ValueError(f"unknown expectation kind: {kind}")


def expectations_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run every rule in one aggregation pass; returns
    (rule, column, n_violations, passed) — one row per rule, in rule
    order."""
    aggs = [
        _violation_expr(r).cast("long").alias(f"v{i}") for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(r[0]).alias("rule"),
            F.lit(r[1]).alias("column"),
            F.col(f"v{i}").alias("n_violations"),
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
