"""K3 JDBC sink exercised against a LIVE JDBC database (embedded Derby,
which ships on Spark's classpath) — closes the round-1 gap where
write_jdbc_metrics was only ever pointed at a parquet stand-in. The real
foreachBatch streaming path writes windowed metrics over JDBC; the table is
then read back over JDBC and compared to the batch flagship query.

(The reference's production target is PostgreSQL — StreamJob.java:176-215;
Derby substitutes the wire-compatible JDBC surface, not the dialect.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.window_metrics import (
    as_transactions,
    window_metrics_over_events,
)
from flink_stream_processing_spark.sources.batch import load_table
from flink_stream_processing_spark.streaming.pipeline import (
    events_file_stream,
    streaming_window_metrics,
    write_jdbc_metrics,
)

from .conftest import SF_SMALL

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_sink_end_to_end(spark, tmp_path):
    """File stream -> watermarked window agg -> foreachBatch JDBC append
    (the exact write_jdbc_metrics path) -> read back over JDBC == batch
    result for every window the watermark closed."""
    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    url = f"jdbc:derby:{tmp_path}/metricsdb;create=true"

    tx = as_transactions(events_file_stream(spark, str(d)))
    agg = streaming_window_metrics(tx, watermark="5 seconds")
    q = (
        write_jdbc_metrics(
            agg,
            url,
            properties=DERBY_PROPS,
            checkpoint=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    written = spark.read.jdbc(url, "remittance_metrics", properties=DERBY_PROPS)

    # append mode emits only windows the final watermark passed
    events = load_table(spark, SF_SMALL, "events")
    max_ts = events.agg(F.max("ts")).head()[0]
    watermark_ms = int(max_ts.timestamp() * 1000) - 5000
    batch = window_metrics_over_events(events).filter(
        F.col("window_end") <= watermark_ms
    )

    got = sorted(tuple(r) for r in written.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert len(got) > 0, "JDBC table is empty — sink never wrote"
    assert got == want
