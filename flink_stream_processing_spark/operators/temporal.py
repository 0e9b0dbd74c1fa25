"""Temporal join operators: as-of join and interval join.

These are the two stream-to-stream join shapes Flink's DataStream API offers
natively (intervalJoin; as-of is the classic enrichment-against-latest-quote
pattern) that Spark SQL has no single built-in operator for. Both are
implemented as compositions of shuffle-friendly DataFrame ops — no Python
UDFs, no range-join cross products.

Scale design (100 TB):
- As-of join: the naive formulation (range join + row_number, or a
  per-left-row MAX subquery) explodes into O(left × right-per-key) work.
  Instead: UNION the two sides tagged with a marker, one shuffle on the key,
  and a running ``last(value, ignorenulls)`` over (key, time, marker) — each
  row is touched exactly once, the only shuffle is the partitionBy(key), and
  Spark's window operator streams per-partition sorted runs (spilling as
  needed). This is the standard distributed as-of construction.
- Interval join: equi-join on (key, time-bucket) where the bucket width
  equals the interval span, so each left row expands to at most 2 bucket
  probes regardless of data volume, then the exact range predicate filters
  within the matched buckets. A plain key-equi-join with a range filter
  would work but sends every (key) pair through the range check — hot keys
  at 100 TB make the bucketed form strictly safer; both sides shuffle on
  the compound (key, bucket) key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` and the same key (ties at equal timestamps
    match, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    ``right`` must be unique per (key, right_ts) — pre-aggregate duplicates
    first, otherwise "the" most recent row is ill-defined.

    Returns all left columns plus ``asof_ts`` (the matched right timestamp)
    and each requested right value column prefixed ``asof_``. ``how="inner"``
    drops left rows with no prior right row; ``"left"`` keeps them with
    nulls.
    """
    right_value_cols = right_value_cols or []
    # Marker sorts right-side rows BEFORE left rows at the same timestamp so
    # an equal-timestamp quote is visible to the trade (>= semantics).
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__asof_ts", F.last("__rts", ignorenulls=True).over(w))
        .withColumns(
            {f"__asof_{c}": F.last(f"__rv_{c}", ignorenulls=True).over(w) for c in right_value_cols}
        )
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        filled = filled.filter(F.col("__asof_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__asof_ts").alias("asof_ts"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_s: float,
    upper_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Flink ``intervalJoin`` semantics: pairs (l, r) with equal keys and
    ``l.ts - lower_s <= r.ts <= l.ts + upper_s`` (bounds inclusive, in
    seconds; sub-second precision is honored via microsecond arithmetic).

    Implementation: left rows are exploded into the (at most 2) time buckets
    their window overlaps — bucket width = the full interval span — and the
    join is a plain equi-join on (key, bucket) with the exact range
    predicate applied after. Columns come back prefixed ``l_`` / ``r_``.
    """
    lower_us = int(lower_s * 1_000_000)
    upper_us = int(upper_s * 1_000_000)
    span_us = max(lower_us + upper_us, 1)
    lo = F.unix_micros(F.col(left_ts)) - F.lit(lower_us)
    hi = F.unix_micros(F.col(left_ts)) + F.lit(upper_us)

    l_b = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        F.explode(F.sequence(F.floor(lo / span_us), F.floor(hi / span_us))).alias("__lb"),
    )
    r_b = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.floor(F.unix_micros(F.col(right_ts)) / span_us).alias("__rb"),
    )
    r_us = F.unix_micros(F.col(f"r_{right_ts}"))
    l_us = F.unix_micros(F.col(f"l_{left_ts}"))
    return (
        l_b.join(
            r_b,
            (F.col(f"l_{key}") == F.col(f"r_{key}")) & (F.col("__lb") == F.col("__rb")),
        )
        .filter((r_us >= l_us - F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us)))
        .drop("__lb", "__rb")
    )


def scd2_collapse(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change-event log into a slowly-changing-dimension type-2
    history: consecutive rows per ``key`` (ordered by ``ts``, then
    ``tiebreak``) with the same ``attr`` value merge into one versioned
    validity interval [valid_from, valid_to); the latest version per key is
    open (valid_to NULL, is_current true). The run-length collapse is the
    classic gaps-and-islands construction: change flag via lag, version id
    via running sum, one group per (key, version).

    Plan shape (100 TB): ONE exchange on ``key`` feeds the change-flag
    window, the running-sum window, the per-run aggregate, AND the
    valid_to lead window — Spark reuses the partitioning across all four,
    so the whole dimension build costs a single shuffle of (key, ts, attr)
    (verify with .explain: one hashpartitioning(key) Exchange). No
    reference twin (the Flink app keeps no versioned state); standard
    warehouse-dimension operator, SURVEY.md §2 relational extension.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    wseq = Window.partitionBy(key).orderBy(*order)
    # null-safe change test: a NULL state is a real state — it must start
    # its own run, not merge into the preceding non-null run (and a run of
    # NULLs must stay ONE run). lag()-is-null can't distinguish "first row"
    # from "previous state was NULL", so first-row is detected explicitly.
    chg = (F.row_number().over(wseq) == 1) | ~F.col(attr).eqNullSafe(
        F.lag(attr).over(wseq)
    )
    versioned = df.select(key, ts, attr, *([tiebreak] if tiebreak else [])).withColumn(
        "version",
        F.sum(F.when(chg, 1).otherwise(0)).over(
            wseq.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = versioned.groupBy(key, "version").agg(
        F.min(attr).alias("state"),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wver = Window.partitionBy(key).orderBy("version")
    return runs.select(
        key,
        F.col("version").cast("long").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wver).alias("valid_to"),
        "n_events",
    ).withColumn("is_current", F.col("valid_to").isNull())
