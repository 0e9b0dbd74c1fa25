"""Plan-inspection helpers (SURVEY.md §4): the engine relies on Catalyst for
pushdown/pruning/join-strategy — these helpers let tests assert the physical
plan actually has those properties, so a future change that silently
regresses e.g. filter pushdown fails CI rather than costing a full 100 TB
scan in production."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if some parquet scan pushed a filter mentioning ``column``."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and column in line and "[]" not in line
        for line in plan.splitlines()
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """Top-k planned as TakeOrderedAndProject (never a global sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read by parquet scans (column-pruning check)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(part.split(":")[0] for part in inner.split(",") if part)
    return cols


def whole_stage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
