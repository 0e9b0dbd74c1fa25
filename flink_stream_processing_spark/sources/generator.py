"""Synthetic remittance-transaction generator (SURVEY.md §2.1 S3).

Reference: ``RemittanceGenerator.java:31-63`` — a Spring @Scheduled producer
emitting one JSON transaction every 2 s (uuid id, SENDER-/RECEIVER- +
rand(100000), amount uniform [0,1), currency from 6 values with a static
rate table where CNY -> 0.0, ts = now) to Kafka.

Spark-first: the scheduler thread becomes a ``rate`` streaming source
(0.5 rows/s to match) with deterministic column expressions replacing the
imperative RNG — seeded ``md5`` of the rate-source ``value`` drives every
"random" choice, so the stream is reproducible, the batch variant
(``spark.range``) produces the identical dataset for differential tests,
AND the whole synthesis is recomputable in DuckDB (md5/sha256 exist in
both engines), giving the generator query a full oracle. (The round-1
version used ``xxhash64``, which has no DuckDB equivalent and left the
entry rows-only.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CURRENCIES, EXCHANGE_RATES


def _h(value: Column, seed: int, n_hex: int = 8) -> Column:
    """Seeded 32-bit (or ``n_hex``*4-bit) hash both engines compute
    identically: leading hex of md5('<seed>:<value>')."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), value.cast("string"))), 1, n_hex
            ),
            16,
            10,
        )
        .cast("long")
    )


def _synthesize(value: Column, event_ts: Column) -> list[Column]:
    """Deterministic column expressions for one transaction, keyed on the
    monotonically-increasing rate-source value."""
    currency = F.element_at(
        F.array(*[F.lit(c) for c in CURRENCIES]),
        (F.pmod(_h(value, 3), F.lit(len(CURRENCIES))) + 1).cast("int"),
    )
    rate = None
    for cur, r in EXCHANGE_RATES.items():
        cond = currency == cur
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(0.0))
    return [
        F.sha2(F.concat(F.lit("txn-"), value.cast("string")), 256).alias("transactionId"),
        F.concat(
            F.lit("SENDER-"), F.pmod(_h(value, 1), F.lit(100000)).cast("string")
        ).alias("senderId"),
        F.concat(
            F.lit("RECEIVER-"), F.pmod(_h(value, 2), F.lit(100000)).cast("string")
        ).alias("receiverId"),
        # amount uniform [0,1) like the reference's random.nextDouble()
        # (RemittanceGenerator.java:38): 52-bit hash fraction (13 hex chars).
        (_h(value, 4, 13) / F.lit(float(1 << 52))).alias("amount"),
        currency.alias("currency"),
        rate.alias("exchangeRate"),
        F.unix_millis(event_ts).alias("timestamp"),
        event_ts.alias("ts"),
    ]


def streaming_transactions(
    spark: SparkSession, rows_per_second: float = 0.5
) -> DataFrame:
    """Streaming generator: rate source -> transaction columns. 0.5 rows/s
    matches the reference's fixedRate=2000 cadence.

    Spark's rate source parses ``rowsPerSecond`` as a LONG (a fractional
    option string throws NumberFormatException at stream start), so a
    fractional rate f = p/q is realized as a rate source at p rows/s with
    every q-th row kept (``value % q == 0``) — exactly p/q rows/s, and the
    kept ``value`` stream stays deterministic so the synthesis hash chain
    (and its oracle) is unchanged."""
    from fractions import Fraction

    frac = Fraction(rows_per_second).limit_denominator(1000)
    p, q = frac.numerator, frac.denominator
    if p <= 0:
        raise ValueError(f"rows_per_second must be positive, got {rows_per_second}")
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", p)
        .load()
    )
    if q > 1:
        rate = rate.filter(F.col("value") % q == 0)
    return rate.select(_synthesize(F.col("value"), F.col("timestamp")))


def batch_transactions(
    spark: SparkSession, n: int, start_ts: str = "2024-01-01 00:00:00", step_ms: int = 2000
) -> DataFrame:
    """Batch variant producing the identical rows (deterministic hash
    expressions) with synthetic event time advancing ``step_ms`` per row —
    used for batch/streaming differential tests."""
    base = spark.range(n)
    event_ts = F.timestamp_millis(
        F.unix_millis(F.lit(start_ts).cast("timestamp")) + F.col("id") * step_ms
    )
    return base.select(_synthesize(F.col("id"), event_ts))
