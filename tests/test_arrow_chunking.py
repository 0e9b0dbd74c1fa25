"""Regression tests for Arrow-chunk-spanning correctness in the Python
lanes: when a partition (mapInPandas) or one key's micro-batch rows
(applyInPandasWithState) exceed ``spark.sql.execution.arrow.maxRecordsPerBatch``
the iterator delivers MULTIPLE chunks, and per-chunk processing must not
change results.  These tests force a tiny batch size (so every partition
spans many chunks) and assert the outputs equal the single-chunk answers.
"""

from __future__ import annotations

import pytest

from flink_stream_processing_spark.queries import ORACLE_SQL, QUERIES

from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture()
def tiny_arrow_batches(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    yield spark
    spark.conf.set(key, old)


def test_partition_local_trend_spans_chunks(tiny_arrow_batches):
    """user_trend_partition_local must accumulate per-user partial sums
    across chunks — with maxRecordsPerBatch=7 every user's rows span many
    chunks; per-chunk emission would yield duplicate user_id rows with
    partial n_events/slope."""
    name = "user_trend_partition_local"
    df = QUERIES[name](tiny_arrow_batches, SF_DIR)
    assert_matches_oracle(df, ORACLE_SQL[name], SF_DIR)


def test_partition_local_trend_no_duplicate_keys(tiny_arrow_batches):
    df = QUERIES["user_trend_partition_local"](tiny_arrow_batches, SF_DIR)
    total = df.count()
    distinct = df.select("user_id").distinct().count()
    assert total == distinct, "duplicate per-user rows: chunk-local emission"


def test_stateful_running_counts_chunked(tiny_arrow_batches, tmp_path):
    """applyInPandasWithState counter must sort the WHOLE key batch, not each
    Arrow chunk independently — chunked arrival in arbitrary order would
    diverge from row_number() OVER (ORDER BY ts, event_id)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_stream_processing_spark.streaming.stateful import (
        running_event_counts,
    )

    spark = tiny_arrow_batches
    # One key, 40 rows, deliberately written in DESCENDING ts order so the
    # chunk split (7 rows) puts later timestamps in earlier chunks.
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 40,
            "event_id": list(range(40, 0, -1)),
            "ts": pd.to_datetime(list(range(40, 0, -1)), unit="s"),
        }
    )
    src = tmp_path / "ev"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp"
    ).parquet(str(src))
    out = running_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("chunked_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("chunked_counts")
        .orderBy("event_id")
        .select("event_id", "running_count")
        .collect()
    )
    # ts ascends with event_id ascending here (ts == event_id seconds), so
    # running_count must equal event_id's rank: 1..40 in event_id order.
    assert [r.running_count for r in got] == list(range(1, 41))
    assert [r.event_id for r in got] == list(range(1, 41))


def test_degenerate_slope_is_null_both_lanes(spark, tmp_path):
    """All events of a user at ONE timestamp => var(x)=0 => slope NULL (not
    NaN) in both the grouped-map and partition-local lanes, matching
    regr_slope."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 8, 8],
            "ts": pd.to_datetime([100, 100, 100, 100, 200], unit="s"),
            "value": [1.0, 2.0, 3.0, 4.0, 6.0],
        }
    )
    d = tmp_path / "deg"
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    for qname in ("grouped_pandas_user_trend", "user_trend_partition_local"):
        rows = {r.user_id: r for r in QUERIES[qname](spark, str(d)).collect()}
        assert rows[7].slope is None, f"{qname}: degenerate slope not NULL"
        srow = rows[8].slope
        assert srow is not None and srow == srow, f"{qname}: real slope lost"
