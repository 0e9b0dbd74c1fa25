"""Gate for the r16-queued streaming span-store probe (stream-static
join against the persisted store). Oracle-gated here via the
driver-equivalent compare; registration deferred per OPERATORS.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
    STREAMING_SPAN_STORE_PROBE_ORACLE,
    q_streaming_span_store_probe,
)

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


def test_streaming_span_store_probe_matches_oracle(spark):
    assert_matches_oracle(
        q_streaming_span_store_probe(spark, SF_DIR),
        STREAMING_SPAN_STORE_PROBE_ORACLE,
        SF_DIR,
    )


def test_streaming_probe_agrees_with_batch_strip_affected_set(spark):
    """Cross-family consistency: the streamed probe's flagged doc set must
    equal the batch incremental strip's affected set — both definitions
    of 'this new doc contains passages the corpus already has' answer
    identically (the strip additionally excises; the probe only flags)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _tokenized,
    )
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        incremental_strip_new_docs,
        span_hash_store,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    probed = {
        r["doc_id"] for r in q_streaming_span_store_probe(spark, SF_DIR).collect()
    }
    toks = _tokenized(load_table(spark, SF_DIR, "documents"))
    corpus = toks.filter(F.col("doc_id") % 10 != 0)
    batch = toks.filter(F.col("doc_id") % 10 == 0)
    store = span_hash_store(corpus).localCheckpoint(eager=True)
    affected = {
        r["doc_id"] for r in incremental_strip_new_docs(batch, store).collect()
    }
    assert probed == affected and len(probed) > 0
