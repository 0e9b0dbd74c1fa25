"""Kafka source/sink (SURVEY.md §2.1 S1/S2, §2.2 K4).

Reference: two ``FlinkKafkaConsumer``s on topic ``remittance-stream``
(StreamJob.java:36-56, :94-95 — the job reads the same topic twice) and a
blocking ``KafkaTemplate`` producer (RemittanceGenerator.java:60-61).

Spark-first: ONE ``readStream`` DataFrame fans out to both the risk and
metrics queries (strict-fidelity dual-reader available by calling this
twice). No broker exists in CI — these builders are exercised by
constructing the plan only; integration requires the spark-sql-kafka
package on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSACTION_SCHEMA

DEFAULT_TOPIC = "remittance-stream"  # StreamJob.java:14
# ONE default broker address for both directions: a source and sink that
# default to different listeners would read from one cluster and write to
# another in any deployment where both happen to resolve. The reference's
# docker-compose exposes an in-cluster listener (kafka:9093) and a host
# listener (localhost:29093); callers outside the compose network pass the
# host listener explicitly.
DEFAULT_BOOTSTRAP = "kafka:9093"


def parse_transaction_wire(values: DataFrame) -> DataFrame:
    """The source's exact value-side parse (S1/S2), broker-independent so
    the wire format is testable without Kafka: JSON ``value`` -> typed
    columns + event-time ``ts``. Malformed records are dropped instead of
    the reference's fail-fast job kill. NOTE: from_json in PERMISSIVE mode
    yields an all-NULL STRUCT (not a NULL struct) for unparseable input, so
    the drop filter must test required fields — a record without the
    identity and event-time fields is unusable downstream either way."""
    parsed = values.select(
        F.from_json(F.col("value").cast("string"), TRANSACTION_SCHEMA).alias("tx")
    )
    return (
        parsed.filter(
            F.col("tx.transactionId").isNotNull() & F.col("tx.timestamp").isNotNull()
        )
        .select("tx.*")
        .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    )


def transaction_wire_value(df: DataFrame) -> DataFrame:
    """The sink's exact value serialization (K4): all columns as one JSON
    object per record — the same shape the reference generator produces
    (RemittanceGenerator.java:43-58). Shared with the wire round-trip test."""
    return df.selectExpr("to_json(struct(*)) AS value")


def kafka_transaction_source(
    spark: SparkSession,
    bootstrap_servers: str = DEFAULT_BOOTSTRAP,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2: JSON-on-Kafka -> typed transaction stream."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_transaction_wire(raw)


def kafka_transaction_sink(
    df: DataFrame,
    bootstrap_servers: str = DEFAULT_BOOTSTRAP,
    topic: str = DEFAULT_TOPIC,
    checkpoint: str | None = None,
):
    """K4: serialize all columns to one JSON value per record. The default
    checkpoint is a fresh unique dir (a fixed shared default would let
    unrelated runs resume each other's offsets — see
    streaming/pipeline._default_checkpoint); production passes an explicit
    durable location."""
    from ..streaming.pipeline import _default_checkpoint

    if checkpoint is None:
        checkpoint = _default_checkpoint("ckpt-kafka-tx-")
    return (
        transaction_wire_value(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
