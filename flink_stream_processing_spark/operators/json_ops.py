"""JSON parse / serialize operators (SURVEY.md §2.3 P1, P4, P5).

Reference: the wire format between every stage is a JSON string —
``mapper.readValue`` at StreamJob.java:61/:101/:186-188 and hand-formatted
serialization at :150-169 / RemittanceGenerator.java:43-58.

Spark-first: ``from_json``/``to_json`` are Catalyst expressions (JVM-side,
codegen) — no row-at-a-time Python. Unlike the reference's fail-fast parse
(a malformed record kills the job), ``from_json`` yields NULL for corrupt
records; ``parse_json_strict`` exposes a dead-letter split instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json(df: DataFrame, json_col: str, schema: StructType, keep: bool = False) -> DataFrame:
    """P1: string -> typed struct, flattened into top-level columns."""
    parsed = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    cols = [c for c in df.columns if keep or c != json_col]
    return parsed.select(*cols, "_parsed.*")


def parse_json_split_corrupt(
    df: DataFrame, json_col: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter variant: (good, corrupt) split — improves on the
    reference's fail-fast behavior (SURVEY.md P1 note)."""
    parsed = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    good = parsed.filter(F.col("_parsed").isNotNull()).select(
        *[c for c in df.columns if c != json_col], "_parsed.*"
    )
    bad = parsed.filter(F.col("_parsed").isNull()).drop("_parsed")
    return good, bad


def serialize_json(df: DataFrame, cols: list[str], out_col: str = "json") -> DataFrame:
    """P4: struct -> JSON string (to_json of selected columns)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def roundtrip_json(df: DataFrame, cols: list[str], schema: StructType) -> DataFrame:
    """P4+P5 composed: serialize then re-parse (the reference's agg->JSON->
    Metric round-trip, StreamJob.java:150-188). Identity on values — used as
    a differential test that the JSON codec is lossless."""
    ser = serialize_json(df.select(*cols), cols)
    return ser.select(F.from_json(F.col("json"), schema).alias("m")).select("m.*")
