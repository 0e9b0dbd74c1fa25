"""Fixed StructTypes for the engine.

Reference DTOs (flat, compile-time classes) become declared StructTypes:
- RemittanceTransaction: reference ``dto/RemittanceTransaction.java:10-18``
- Metric (window-agg output): reference ``dto/Metric.java:12-22``
- RiskLabel (intended semantics): reference ``dto/RiskLabel.java:12-19``
  (the reference never sets transactionId/amount — we implement the intended
  carry-through, per SURVEY.md §1.1)

Driver test tables (TESTDATA.md / FIXTURES.md §2) are read with parquet
schema inference; the StructTypes here are for stream sources where
inference isn't available (Kafka JSON, rate-source synthesis).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input event of the reference pipeline (JSON on the Kafka topic
# ``remittance-stream``). ``timestamp`` is event-time epoch millis.
TRANSACTION_SCHEMA = StructType(
    [
        StructField("transactionId", StringType()),
        StructField("senderId", StringType()),
        StructField("receiverId", StringType()),
        StructField("amount", DoubleType()),
        StructField("currency", StringType()),
        StructField("exchangeRate", DoubleType()),
        StructField("timestamp", LongType()),
    ]
)

# Output row of the windowed aggregation (JDBC table ``remittance_metrics``).
METRIC_SCHEMA = StructType(
    [
        StructField("windowStart", LongType()),
        StructField("windowEnd", LongType()),
        StructField("count", LongType()),
        StructField("avgAmount", DoubleType()),
        StructField("avgExchangeRate", DoubleType()),
        StructField("minAmount", DoubleType()),
        StructField("maxAmount", DoubleType()),
        StructField("successCount", IntegerType()),
        StructField("failureCount", IntegerType()),
    ]
)

# Per-event enrichment output (intended semantics: typed longs, id+amount
# carried through; the reference stores latency/processingTime stringly).
RISK_LABEL_SCHEMA = StructType(
    [
        StructField("transactionId", StringType()),
        StructField("amount", DoubleType()),
        StructField("processingTime", LongType()),
        StructField("latency", LongType()),
        StructField("riskType", StringType()),
    ]
)

# ``events.props`` JSON payload (driver table; exercises from_json — the
# reference's P1 JSON-parse operator analogue).
PROPS_SCHEMA = StructType([StructField("k", LongType())])

# Static per-currency exchange-rate table, reference-SHAPED (same currency
# set and the same deliberate CNY -> 0.0 poison value that drives
# failureCount in the window aggregate, RemittanceGenerator.java:65-74) but
# not value-identical: the non-poison rates here are this engine's own
# constants, roughly-current market rates rather than the reference's.
EXCHANGE_RATES: dict[str, float] = {
    "USD": 1.0,
    "NPR": 132.5,
    "INR": 83.2,
    "CNY": 0.0,
    "AUD": 1.52,
    "EUR": 0.92,
}

CURRENCIES = list(EXCHANGE_RATES)

# Driver test-table names (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
