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


def test_jdbc_upsert_replay_converges(spark, tmp_path):
    """Replay-safe upsert sink: UPDATE-mode window metrics (partial windows
    re-emit and get replaced) upserted into Derby must converge to the
    batch flagship result — and running the WHOLE stream a second time
    from a fresh checkpoint (full replay, the worst-case duplicate
    scenario for the append sink) must leave the table unchanged."""
    from flink_stream_processing_spark.streaming.pipeline import (
        write_jdbc_upsert,
    )

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    url = f"jdbc:derby:{tmp_path}/upsertdb;create=true"

    def run_once(ckpt: str) -> None:
        tx = as_transactions(events_file_stream(spark, str(d)))
        agg = streaming_window_metrics(tx, watermark="5 seconds")
        q = (
            write_jdbc_upsert(
                agg,
                url,
                table="metrics_upsert",
                keys=["window_start"],
                properties=DERBY_PROPS,
                checkpoint=ckpt,
                output_mode="update",
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once(str(tmp_path / "ckpt1"))
    run_once(str(tmp_path / "ckpt2"))  # fresh checkpoint = full replay

    got = (
        spark.read.jdbc(url, "metrics_upsert", properties=DERBY_PROPS)
        .orderBy("window_start")
        .collect()
    )
    # update mode + upsert => the table holds EVERY window (open ones
    # included) at its final value: exactly the batch query.
    events = load_table(spark, SF_SMALL, "events")
    want = (
        window_metrics_over_events(events).orderBy("window_start").collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_jdbc_upsert_credentialed_connection(spark, tmp_path):
    """The driver-side merge connection must honor the JDBC properties dict
    (user/password), not just the bare URL: Derby with builtin auth enabled
    rejects unauthenticated connections, so a passing upsert proves the
    credentials actually flow through DriverManager.getConnection(url,
    props). (The ADVICE.md pipeline.py:241 defect: creds were dropped.)"""
    from flink_stream_processing_spark.streaming.pipeline import (
        write_jdbc_upsert,
    )

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    # create the db with builtin auth ON and one user; every later
    # connection (executor writes AND the driver-side merge) must present
    # user/password via properties — none are embedded in this URL.
    boot = f"jdbc:derby:{tmp_path}/authdb;create=true"
    jvm = spark._jvm
    jprops = jvm.java.util.Properties()
    conn = jvm.java.sql.DriverManager.getConnection(boot, jprops)
    st = conn.createStatement()
    for k, v in [
        ("derby.connection.requireAuthentication", "true"),
        ("derby.authentication.provider", "BUILTIN"),
        ("derby.user.graft", "s3cret"),
    ]:
        st.executeUpdate(
            "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY"
            f"('{k}', '{v}')"
        )
    st.close()
    conn.close()
    # shut the db down so auth takes effect on next boot
    try:
        jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{tmp_path}/authdb;shutdown=true"
        )
    except Exception:
        pass  # Derby signals successful shutdown via SQLException

    url = f"jdbc:derby:{tmp_path}/authdb"
    props = {**DERBY_PROPS, "user": "graft", "password": "s3cret"}

    tx = as_transactions(events_file_stream(spark, str(d)))
    agg = streaming_window_metrics(tx, watermark="5 seconds")
    q = (
        write_jdbc_upsert(
            agg,
            url,
            table="metrics_auth",
            keys=["window_start"],
            properties=props,
            checkpoint=str(tmp_path / "ckpt"),
            output_mode="update",
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.read.jdbc(url, "metrics_auth", properties=props)
    events = load_table(spark, SF_SMALL, "events")
    assert got.count() == window_metrics_over_events(events).count()


def test_jdbc_upsert_rejects_duplicate_keyed_batch(spark, tmp_path):
    """A micro-batch with >1 row per key violates the sink's precondition
    and must raise (old behavior: silent duplicate inserts)."""
    from flink_stream_processing_spark.streaming.pipeline import (
        write_jdbc_upsert,
    )

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    url = f"jdbc:derby:{tmp_path}/dupdb;create=true"

    # per-event rows keyed on user_id: many rows per key in one batch.
    ev = events_file_stream(spark, str(d)).select("event_id", "user_id")
    q = (
        write_jdbc_upsert(
            ev,
            url,
            table="dup_target",
            keys=["user_id"],
            properties=DERBY_PROPS,
            checkpoint=str(tmp_path / "ckpt"),
            output_mode="append",
        )
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="one row per key"):
        q.awaitTermination(120)
        raise AssertionError("stream finished but should have failed")


def test_jdbc_upsert_identifier_contract():
    """Plain and pre-quoted table names accepted; junk rejected loudly."""
    import pytest as _pytest

    from flink_stream_processing_spark.streaming.pipeline import (
        _check_sql_identifier,
        _staging_name,
    )

    _check_sql_identifier("metrics")
    _check_sql_identifier('"Mixed Case"')
    assert _staging_name("metrics") == "metrics_staging"
    assert _staging_name('"MyTable"') == '"MyTable_staging"'
    for bad in ("my table", "t;drop", 'a"b', ""):
        with _pytest.raises(ValueError):
            _check_sql_identifier(bad)


def test_jdbc_upsert_replaces_stale_rows(spark, tmp_path):
    """Rows pre-seeded with stale values for existing keys must be
    REPLACED, not duplicated (the keyed DELETE+INSERT contract)."""
    from flink_stream_processing_spark.streaming.pipeline import (
        write_jdbc_upsert,
    )

    d = tmp_path / "events_dir"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{SF_SMALL}/events.parquet")
    url = f"jdbc:derby:{tmp_path}/staledb;create=true"

    tx = as_transactions(events_file_stream(spark, str(d)))
    agg = streaming_window_metrics(tx, watermark="5 seconds")
    # seed the target with a corrupted copy of the expected output (same
    # keys, wrong counts) BEFORE the stream runs
    events = load_table(spark, SF_SMALL, "events")
    stale = window_metrics_over_events(events).withColumn(
        "cnt", F.lit(-1).cast("long")
    )
    stale.write.mode("append").jdbc(
        url, "metrics_stale", properties=DERBY_PROPS
    )

    q = (
        write_jdbc_upsert(
            agg,
            url,
            table="metrics_stale",
            keys=["window_start"],
            properties=DERBY_PROPS,
            checkpoint=str(tmp_path / "ckpt"),
            output_mode="update",
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    got = spark.read.jdbc(url, "metrics_stale", properties=DERBY_PROPS)
    assert got.filter(F.col("cnt") == -1).count() == 0
    want = window_metrics_over_events(events)
    assert got.count() == want.count()
