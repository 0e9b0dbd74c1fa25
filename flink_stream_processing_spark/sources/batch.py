"""Batch file sources (SURVEY.md §2.1 S4).

The reference has no file sources; this is the engine's batch scan path over
the driver's parquet tables. Parquet scans get predicate pushdown, column
pruning and partition-size splitting from Spark for free — at 100 TB the
same code runs unchanged, with ``spark.sql.files.maxPartitionBytes``
controlling split granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DRIVER_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver parquet stores these as TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong they arrive as epoch-nanos longs and
# are converted here to TimestampType (microsecond truncation — identical to
# how DuckDB reads TIMESTAMP_NS).
TIMESTAMP_NANOS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-settable; guards sessions built outside session.get_spark
    # (e.g. the driver's own session). The timezone pin matters for the
    # NTZ->TIMESTAMP normalization below: the cast reinterprets wall-clock
    # values in the SESSION timezone, so a foreign session running in,
    # say, America/New_York would silently shift every event time by
    # hours. The whole engine's event-time math (windows, epoch millis,
    # oracles) is defined in UTC — pin it wherever tables are loaded.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TIMESTAMP_NANOS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer division — a double divide loses exactness at 1e15+
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    # Normalize TIMESTAMP_NTZ -> TIMESTAMP (session tz is UTC, so this is
    # value-preserving) so epoch/unix functions work uniformly downstream.
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Schema-on-read file sources beyond parquet. CSV and JSON-lines carry no
# embedded types, so reads take an EXPLICIT schema (never inferSchema — a
# full extra pass over 100 TB) and an explicit timestampFormat. ORC keeps
# its types like parquet. Avro would need the spark-avro package (absent in
# this container) and is deliberately not stubbed.

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _fmt_options(fmt: str) -> dict[str, str]:
    """The per-format reader/writer options, defined ONCE: the schema-on-
    read round-trip gates require the writer and reader to use byte-
    identical option sets, so they must not be maintained as two separate
    if-chains that can drift."""
    if fmt == "csv":
        return {"header": "true", "timestampFormat": _TS_FMT}
    if fmt == "json":
        return {"timestampFormat": _TS_FMT}
    if fmt == "xml":
        # Spark 4 native XML (built-in since 4.0; no spark-xml package).
        return {"rowTag": "row", "timestampFormat": _TS_FMT}
    return {}


def export_table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str, out_dir: str
) -> None:
    """Write a driver table in another format (test fixture for the
    schema-on-read paths; at scale this is the engine's file SINK for the
    same formats)."""
    df = load_table(spark, sf_dir, name)
    w = df.write.mode("overwrite").format(fmt)
    for k, v in _fmt_options(fmt).items():
        w = w.option(k, v)
    w.save(out_dir)


def load_table_fmt(spark: SparkSession, path: str, schema, fmt: str) -> DataFrame:
    """Read a table from csv/json/orc/xml with an EXPLICIT schema (schema-
    on-read; no inference pass). ``schema`` is a StructType — in practice
    the canonical table's own schema (``load_table(...).schema``), i.e.
    the catalog supplies types, the file supplies bytes. The schema is
    applied for EVERY format including the self-describing ones (orc):
    the caller's declared types are the contract, not whatever the file
    happens to embed."""
    r = spark.read.format(fmt).schema(schema)
    for k, v in _fmt_options(fmt).items():
        r = r.option(k, v)
    return r.load(path)
