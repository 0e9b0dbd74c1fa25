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


def kafka_transaction_source(
    spark: SparkSession,
    bootstrap_servers: str = "kafka:9093",
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2: JSON-on-Kafka -> typed columns + event-time ``ts``. Malformed
    records become NULL structs (filtered) instead of the reference's
    fail-fast job kill."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), TRANSACTION_SCHEMA).alias("tx")
    )
    return (
        parsed.filter(F.col("tx").isNotNull())
        .select("tx.*")
        .withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    )


def kafka_transaction_sink(
    df: DataFrame,
    bootstrap_servers: str = "localhost:29093",
    topic: str = DEFAULT_TOPIC,
    checkpoint: str = "/tmp/ckpt-kafka-tx",
):
    """K4: serialize all columns to one JSON value per record."""
    return (
        df.selectExpr("to_json(struct(*)) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
