"""Per-event risk labeling + print-sink formatting (SURVEY.md §2.3 P2, P3).

Reference: StreamJob.java:67-78 (labeler map) and :81-90 (format + print).
Per event the reference captures wall-clock processing time, computes
``latency = now - event.timestamp`` and labels ``riskType = amount > 1000 ?
"RISK" : "SAFE"``. We implement the *intended* semantics — transactionId and
amount are carried through (the reference forgets to set them and prints
``TxId=null``; SURVEY.md §1.1).

Spark-first: the per-event mutable-POJO map becomes pure column expressions —
narrow, no shuffle, fused into whole-stage codegen; at 100 TB this is a
zero-cost projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RISK_THRESHOLD = 1000.0  # StreamJob.java:76


def label_risk(
    tx: DataFrame,
    threshold: float = RISK_THRESHOLD,
    with_latency: bool = True,
) -> DataFrame:
    """P2. ``with_latency=False`` yields the deterministic projection used by
    the oracle gate (wall-clock columns are nondeterministic by design)."""
    out = tx.withColumn(
        "risk_type",
        F.when(F.col("amount") > threshold, F.lit("RISK")).otherwise(F.lit("SAFE")),
    )
    if with_latency:
        # StreamJob.java:70-74 — wall-clock at labeling; epoch-ms longs, not
        # the reference's stringly-typed values.
        out = (
            out.withColumn("processing_time", F.unix_millis(F.current_timestamp()))
            .withColumn("latency", F.col("processing_time") - F.unix_millis(F.col("ts")))
        )
    return out


def format_risk_lines(labeled: DataFrame, with_latency: bool = True) -> DataFrame:
    """P3: the print-sink line (StreamJob.java:82-89). Amount is pre-rounded
    so %.2f formatting is decimal-exact and oracle-comparable."""
    amt = F.round(F.col("amount"), 2)
    if with_latency:
        line = F.format_string(
            "TxId=%s, Amount=%.2f, Risk=%s, ProcessingTime=%d, Latency=%d ms",
            F.col("transactionId"), amt, F.col("risk_type"),
            F.col("processing_time"), F.col("latency"),
        )
    else:
        line = F.format_string(
            "TxId=%s, Amount=%.2f, Risk=%s", F.col("transactionId"), amt, F.col("risk_type")
        )
    return labeled.select(F.col("transactionId"), line.alias("line"))
