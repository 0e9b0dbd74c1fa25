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


def test_streaming_takedown_decrements_match_oracle(spark):
    from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
        STREAMING_TAKEDOWN_DECREMENTS_ORACLE,
        q_streaming_takedown_decrements,
    )

    assert_matches_oracle(
        q_streaming_takedown_decrements(spark, SF_DIR),
        STREAMING_TAKEDOWN_DECREMENTS_ORACLE,
        SF_DIR,
    )


def test_streaming_takedown_agrees_with_batch_decrements(spark):
    """Convention lock: the streamed per-doc decrement masses must equal
    the batch tombstone path's (token_window_hashes -> distinct ->
    per-doc count over the expanded holder set) — pinning that the
    stream-side doc-local hash expr and the batch operator can never
    drift apart, and that the decrement totals feeding
    purged_refcount_store agree across both arms."""
    from flink_stream_processing_spark.operators.dedup import token_window_hashes
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _TOMBSTONE_RESIDUE,
        _tokenized,
        takedown_holder_ids,
        tombstone_decrements,
    )
    from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
        q_streaming_takedown_decrements,
    )
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import _SPAN_W
    from flink_stream_processing_spark.sources.batch import load_table

    streamed = {
        (r["doc_id"], r["n_dec_hashes"])
        for r in q_streaming_takedown_decrements(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    removed = takedown_holder_ids(
        corpus, corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    )
    removed_toks = _tokenized(corpus).join(removed, "doc_id", "semi")
    counts = (
        token_window_hashes(removed_toks, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    batch = {
        (r["doc_id"], r["n"])
        for r in removed.join(counts, "doc_id", "left")
        .select("doc_id", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
    # and the total decrement mass matches the (h, n_dec) side the purge
    # actually consumes
    total = sum(n for _, n in batch)
    dec_total = (
        tombstone_decrements(removed_toks).agg(F.sum("n_dec")).first()[0]
    )
    assert total == dec_total


def test_streaming_takedown_dedupes_identical_requests(spark, tmp_path):
    """Planted byte-identical takedown requests (r14 advice): two docs in
    the request slice (doc_id % 10 == 3) share identical text, so they
    collapse to ONE fingerprint — each corpus holder must emit exactly
    one decrement row, not one per request copy. The sf fixtures happen
    to contain no such pair; this plants one so the dedup is a
    construction guarantee, not a fixture property."""
    from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
        q_streaming_takedown_decrements,
    )

    taken = " ".join(f"tk{i}" for i in range(30))
    other = " ".join(f"ot{i}" for i in range(25))
    rows = [
        # corpus holders of the taken-down content (residues != 0)
        (1, taken), (11, taken), (21, taken),
        (2, other),
        # request slice: TWO byte-identical requests + one for `other`
        (3, taken), (13, taken), (23, other),
    ]
    # ONE parquet FILE named documents.parquet — the driver fixtures'
    # layout, which table_stream_dir symlinks into the stream source dir
    # (a Spark-written directory would sit behind the symlink unseen).
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "planted")
    (tmp_path / "planted").mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": [t for _, t in rows],
                "lang": ["en"] * len(rows),
                "source": ["synthetic"] * len(rows),
                "n_chars": pa.array([len(t) for _, t in rows], pa.int64()),
            }
        ),
        f"{sf_dir}/documents.parquet",
    )

    out = q_streaming_takedown_decrements(spark, sf_dir).collect()
    got = sorted((r["doc_id"], r["n_dec_hashes"]) for r in out)
    # One row per HOLDER, each exactly ONCE — without the request-side
    # dedup, docs 1/3/11/13/21 would each emit twice (once per identical
    # request copy). The request docs are corpus members themselves
    # (residue 3 != 0), so they are holders too. 30-token doc -> 11
    # windows, 25-token doc -> 6 (n - W + 1 at W=20, all distinct here).
    assert got == [
        (1, 11), (2, 6), (3, 11), (11, 11), (13, 11), (21, 11), (23, 6),
    ], got


# --- streaming IVF assignment (prepared; planned name streaming_ivf_assign) --


def test_streaming_ivf_assign_matches_oracle(spark):
    from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
        STREAMING_IVF_ASSIGN_ORACLE,
        q_streaming_ivf_assign,
    )

    assert_matches_oracle(
        q_streaming_ivf_assign(spark, SF_DIR), STREAMING_IVF_ASSIGN_ORACLE, SF_DIR
    )


def test_streaming_ivf_assign_equals_batch_assign(spark):
    """Stream ≡ batch law: the streamed assignment rows (vec_id,
    assigned_label, sim) are exactly the batch ivf_store_append output —
    the two paths share one oracle string by construction
    (_span_shared._IVF_ASSIGN_ORACLE), and this pins the ENGINE sides to
    each other too (max_by tie-break == window row_number tie-break)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        q_ivf_store_append,
    )
    from flink_stream_processing_spark.queries_impl.streaming_maintenance import (
        q_streaming_ivf_assign,
    )

    got = sorted(
        (r["vec_id"], r["assigned_label"], r["sim"])
        for r in q_streaming_ivf_assign(spark, SF_DIR).collect()
    )
    want = sorted(
        (r["vec_id"], r["assigned_label"], r["sim"])
        for r in q_ivf_store_append(spark, SF_DIR).collect()
    )
    assert got == want and len(want) > 0
