"""O1-O3 (SURVEY.md §2.7): StreamingQueryListener progress collection and
unit formatting, plus the foreachBatch sink mechanics (K3's shape, exercised
against parquet since no PostgreSQL exists in CI)."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from flink_stream_processing_spark.streaming.metrics import (
    ProgressCollector,
    bytes_to_mb,
    ratio_to_pct,
)


def test_unit_formatting():
    assert bytes_to_mb(10 * 1024 * 1024) == 10.0
    assert ratio_to_pct(0.42) == 42.0


def test_progress_collector_receives_batches(spark, tmp_path):
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        q = (
            df.writeStream.format("memory")
            .queryName(f"obs_{uuid.uuid4().hex[:8]}")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 30
        while time.time() < deadline and not collector.progress:
            time.sleep(0.5)
        q.stop()
        assert collector.progress, "listener never received progress"
        p = collector.progress[-1]
        assert p["batch_id"] >= 0
        assert p["batch_duration_ms"] is not None
    finally:
        spark.streams.removeListener(collector)


def test_foreach_batch_sink_mechanics(spark, tmp_path):
    """K3's foreachBatch append path, pointed at parquet: every closed
    micro-batch lands exactly once."""
    from flink_stream_processing_spark.operators.window_metrics import as_transactions
    from flink_stream_processing_spark.streaming.pipeline import (
        events_file_stream,
        streaming_window_metrics,
    )

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    agg = streaming_window_metrics(as_transactions(events_file_stream(spark, str(d))))

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode withholds windows not yet past the watermark; everything
    # written must be a subset of the batch result, keyed identically
    from flink_stream_processing_spark.operators.window_metrics import (
        window_metrics_over_events,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    batch = {
        r["window_start"]: tuple(r)
        for r in window_metrics_over_events(
            load_table(spark, "/root/testdata/sf0.001", "events")
        ).collect()
    }
    import os

    if os.path.exists(out):
        for r in spark.read.parquet(out).collect():
            assert tuple(r) == batch[r["window_start"]]
