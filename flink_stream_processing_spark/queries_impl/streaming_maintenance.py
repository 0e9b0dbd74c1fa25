"""Streaming arm of the store-maintenance family (r16 lookahead,
prepared in r14): the incoming crawl feed probed LIVE against the
persisted span store — the shape a real ingest service runs between the
batch maintenance windows.

Structured Streaming expresses this as a STREAM-STATIC join: the feed's
window hashes build doc-locally on the stream side (narrow ops only —
split/sequence/transform/explode, no stream-side shuffle before the
join), the persisted store is the static side, and the per-doc match
count aggregates in complete mode over the finite fixture feed. At
100 TB the static side is the hash-bucketed store table; Spark reloads
static-side files per micro-batch, so the store's partition pruning on
the join key is what keeps each micro-batch's probe bucket-local.

NOT YET REGISTERED (r14 freshness arithmetic — see OPERATORS.md): the
query carries its planned registry name and oracle, gated by
tests/test_streaming_maintenance.py through the driver-equivalent
compare; r16 flips it to ``@query`` + queries.py import + ledger row.

Reference parity note: the reference (StreamJob.java:27-45) joins a
stream against nothing — this composition belongs to the LLM-pipeline
extension's incremental-dedup arc; the stream-static pattern is public
Structured Streaming doctrine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import token_window_hashes
from ..operators.text import tokens_col
from ..sources.batch import load_table
from ._stream_helpers import _run_stream_to_table, _stream_session, table_stream_dir
from .store_maintenance import _SPAN_WINDOW_CTES
from .web_dedup_stream import _SPAN_W, documents_file_stream, span_hash_store

# --- planned registry name: streaming_span_store_probe ----------------------

STREAMING_SPAN_STORE_PROBE_ORACLE = f"""
WITH {_SPAN_WINDOW_CTES},
store AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 <> 0),
m AS (
  SELECT doc_id, s FROM h
  WHERE doc_id % 10 = 0 AND h IN (SELECT h FROM store)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def q_streaming_span_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest feed probed against the persisted span store through the
    REAL streaming path: batch docs (the %10 split convention) arrive as
    a file stream, their W-token window hashes build doc-locally, and a
    stream-static inner join against the store counts each doc's
    duplicated windows (complete mode — the finite fixture's exact
    per-doc totals, hash-checked against the batch oracle). Docs with
    zero matches produce no row, exactly like the oracle's inner
    semantics. This is the read-side twin of span_store_compaction: what
    the batch maintenance appends tonight, this stream sees tomorrow."""
    s = _stream_session(spark)
    corpus = (
        load_table(s, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 != 0)
        .select(F.col("doc_id"), tokens_col().alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("long"))
    )
    store = span_hash_store(corpus).localCheckpoint(eager=True)
    stream = documents_file_stream(s, table_stream_dir(sf_dir, "documents")).filter(
        F.col("doc_id") % 10 == 0
    )
    wins = token_window_hashes(
        stream.select(F.col("doc_id"), tokens_col().alias("toks")).withColumn(
            "n_tokens", F.size("toks").cast("long")
        ),
        _SPAN_W,
    )
    agg = (
        wins.join(store.select("h"), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_windows"))
    )
    return _run_stream_to_table(agg, "complete").orderBy("doc_id")
