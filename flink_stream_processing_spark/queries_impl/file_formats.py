"""File-format source/sink queries: CSV, JSON-lines, and ORC round-trips.

Each query exports the events table in the target format once (cached per
sf_dir), reads it back through the schema-on-read path (explicit schema —
inferSchema would be a full extra pass at 100 TB), and aggregates per
event type including min/max event-time millis — so the oracle (the same
aggregate straight off the canonical parquet in DuckDB) certifies that
values AND microsecond timestamps survive the format round-trip, gating
both the sink and the source for each format.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import export_table, load_table, load_table_fmt

_EXPORT_DIRS: dict[tuple[str, str], str] = {}


def _events_in_format(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    key = (sf_dir, fmt)
    d = _EXPORT_DIRS.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"events_{fmt}_")
        export_table(spark, sf_dir, "events", fmt, d)
        _EXPORT_DIRS[key] = d
    return load_table_fmt(spark, d, load_table(spark, sf_dir, "events").schema, fmt)


_ROUNDTRIP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(value), 2) AS sum_value,
       min(epoch_ms(ts))::BIGINT AS min_ts_ms,
       max(epoch_ms(ts))::BIGINT AS max_ts_ms
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min(F.unix_millis("ts")).alias("min_ts_ms"),
            F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        )
        .orderBy("event_type")
    )


@query("csv_source_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip_agg(_events_in_format(spark, sf_dir, "csv"))


@query("json_source_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip_agg(_events_in_format(spark, sf_dir, "json"))


@query("orc_source_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip_agg(_events_in_format(spark, sf_dir, "orc"))
