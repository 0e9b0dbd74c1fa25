"""Custom PYTHON DATA SOURCE (Spark 4.x ``pyspark.sql.datasource``): the
reference's synthetic transaction generator re-expressed as a first-class
pluggable source — ``spark.read.format("txn_gen")`` — instead of a
driver-side loop (reference `RemittanceGenerator.java:13-75` produces one
JSON event at a time into Kafka; sources/generator.py covers the
rate-stream path; this covers the catalog-pluggable batch form).

The synthesis is a Lehmer LCG step per row id — pure 63-bit-safe integer
arithmetic, so a SQL oracle regenerates the identical rows from
``generate_series`` (the same bit-reproducibility convention as the
seeded-md5 samplers). CNY rows get exchange_rate 0.0, reproducing the
reference generator's poison-value behavior (`RemittanceGenerator.java:49`).

Scale design: the reader declares ``InputPartition``s and each partition
generates its own row range — embarrassingly parallel, no driver
materialization; ``partitions`` is the parallelism knob exactly like a
real connector's split planning.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_M = 2147483647  # Lehmer modulus (2^31 - 1)
_A = 48271  # Lehmer multiplier

# This source's OWN synthetic currency set — intentionally distinct from
# schemas.CURRENCIES (the reference's remittance table): the list and its
# order are pinned by the DuckDB oracles that recompute the synthesis
# formula literally, so editing it means editing those oracle strings in
# the same change.
TXN_CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CNY"]

TXN_SCHEMA = (
    "txn_id bigint, amount double, currency string, exchange_rate double"
)


def synthesize(i: int) -> tuple:
    """Row i of the deterministic stream (documented formula — the DuckDB
    oracle recomputes exactly this)."""
    h = (i * _A) % _M
    amount = (h % 1000000) / 100.0
    cur = TXN_CURRENCIES[h % len(TXN_CURRENCIES)]
    rate = 0.0 if cur == "CNY" else ((h % 400) + 50) / 100.0
    return (i, amount, cur, rate)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _TxnReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("partitions", "4"))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")
        if self.num_partitions < 1:
            raise ValueError(
                f"partitions must be >= 1, got {self.num_partitions}"
            )

    def partitions(self):
        if self.rows == 0:
            # one empty range: returning [] means "unpartitioned" to the
            # Python datasource API, which then calls read(None)
            return [_RangePartition(0, 0)]
        per = -(-self.rows // self.num_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield synthesize(i)


class TxnGenDataSource(DataSource):
    """``spark.read.format("txn_gen").option("rows", N).option("partitions",
    P).load()`` after ``spark.dataSource.register(TxnGenDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_gen"

    def schema(self) -> str:
        return TXN_SCHEMA

    def reader(self, schema):
        return _TxnReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: N802
        return _TxnStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the txn_gen format on a session."""
    spark.dataSource.register(TxnGenDataSource)


class _TxnStreamReader(SimpleDataSourceStreamReader):
    """``SimpleDataSourceStreamReader``: offsets are plain row counters, so
    replay between offsets is exact (the reader is deterministic), giving
    the source end-to-end exactly-once under checkpointing — the property
    the reference's fire-and-forget Kafka producer loop does NOT have.
    Emits ``batch_rows`` rows per micro-batch up to ``rows`` total."""

    def __init__(self, options):
        self.total = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "250"))
        if self.total < 0:
            raise ValueError(f"rows must be >= 0, got {self.total}")
        if self.batch_rows < 1:
            # batch_rows <= 0 would return an empty batch with an
            # unchanged offset forever — a silent stall, not a config error
            raise ValueError(f"batch_rows must be >= 1, got {self.batch_rows}")

    def initialOffset(self) -> dict:  # noqa: N802
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.total)
        return iter([synthesize(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter([synthesize(i) for i in range(start["next"], end["next"])])

    def commit(self, end: dict) -> None:
        pass
