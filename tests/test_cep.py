"""CEP boundary semantics on hand-built sequences: the batch window
formulation and the streaming monotone-state matcher must agree on every
edge (the registry oracle proves corpus-level equality; these pin the
boundary cases that a random corpus may never hit), plus cross-micro-batch
state carry for the streaming operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_stream_processing_spark.streaming.stateful import cep_funnel_matches

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _run_batch_cep(spark, rows):
    """The batch CEP pipeline applied to hand-built rows (same logic as
    q_cep_funnel_sequences, inlined so fixtures need no parquet)."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ten = F.expr("INTERVAL 10 MINUTES")
    o = ev.withColumn(
        "last_view", F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(seq)
    )
    qual = (
        (F.col("event_type") == "click")
        & F.col("last_view").isNotNull()
        & (F.col("ts") <= F.col("last_view") + ten)
    )
    o2 = o.withColumn("last_qual_click", F.max(F.when(qual, F.col("ts"))).over(seq))
    matched = o2.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_qual_click").isNotNull()
        & (F.col("ts") <= F.col("last_qual_click") + ten)
    )
    return sorted(r["event_id"] for r in matched.collect())


def _run_stream_cep(spark, rows, tmp_path, n_files=1):
    """Drive the streaming matcher over the same rows, optionally split
    across n_files micro-batches (maxFilesPerTrigger=1) to exercise state
    carry."""
    import uuid

    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    d = tmp_path / f"cep_{uuid.uuid4().hex[:8]}"
    d.mkdir()
    per = -(-len(rows) // n_files)
    ordered = sorted(rows, key=lambda r: (r[2], r[1]))
    for i in range(n_files):
        chunk = ordered[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(
                chunk, "user_id long, event_id long, ts timestamp, event_type string"
            ).coalesce(1).write.parquet(str(d / f"f{i}.parquet"))
    # read the directory as a stream; each parquet dir counts as files
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    name = f"cep_{uuid.uuid4().hex[:8]}"
    q = (
        cep_funnel_matches(stream)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return sorted(r["purchase_id"] for r in spark.table(name).collect())


CASES = {
    # exactly at the 10-minute boundary: inclusive (<=) on both steps
    "boundary_inclusive": [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(600), "click"),      # view+600s: qualifies (inclusive)
        (1, 3, _mk(1200), "purchase"),  # click+600s: matches (inclusive)
    ],
    "boundary_exceeded": [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(601), "click"),      # 1s too late: no qualifying click
        (1, 3, _mk(700), "purchase"),
    ],
    # click BEFORE any view never qualifies
    "click_before_view": [
        (1, 1, _mk(0), "click"),
        (1, 2, _mk(10), "view"),
        (1, 3, _mk(20), "purchase"),
    ],
    # relaxed contiguity: noise events interleave freely
    "interleaved_noise": [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(5), "error"),
        (1, 3, _mk(10), "click"),
        (1, 4, _mk(15), "signup"),
        (1, 5, _mk(20), "purchase"),
    ],
    # a later view re-arms the window for a later click
    "rearm": [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(700), "view"),
        (1, 3, _mk(750), "click"),
        (1, 4, _mk(800), "purchase"),
    ],
    # two purchases after one qualifying click both match
    "multi_purchase": [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(10), "click"),
        (1, 3, _mk(20), "purchase"),
        (1, 4, _mk(30), "purchase"),
    ],
}

EXPECTED = {
    "boundary_inclusive": [3],
    "boundary_exceeded": [],
    "click_before_view": [],
    "interleaved_noise": [5],
    "rearm": [4],
    "multi_purchase": [3, 4],
}


def test_batch_cep_boundary_semantics(spark):
    for name, rows in CASES.items():
        assert _run_batch_cep(spark, rows) == EXPECTED[name], name


def test_streaming_cep_agrees_single_batch(spark, tmp_path):
    for name, rows in CASES.items():
        got = _run_stream_cep(spark, rows, tmp_path, n_files=1)
        assert got == EXPECTED[name], name


def test_streaming_cep_state_carries_across_batches(spark, tmp_path):
    """Pattern spanning micro-batches: view in batch 1, click in batch 2,
    purchase in batch 3 — only cross-batch state can match it."""
    rows = [
        (1, 1, _mk(0), "view"),
        (1, 2, _mk(60), "click"),
        (1, 3, _mk(120), "purchase"),
    ]
    got = _run_stream_cep(spark, rows, tmp_path, n_files=3)
    assert got == [3]
