"""Semantic tests for the r11 web-dedup additions beyond the driver's
oracle gate: span exactness/maximality recomputed from raw text, and
streaming/batch agreement on the canonical-URL key set."""

from __future__ import annotations

import re

from flink_stream_processing_spark.queries import QUERIES

from .conftest import SF_DIR

SF_SMALL = "/root/testdata/sf0.001"


def test_cross_doc_spans_are_exact_and_maximal(spark):
    """Every reported span must be an EXACT shared token run between the
    two documents, and MAXIMAL: extending one token left or right either
    leaves a document's bounds or breaks equality. Recomputed from the
    raw text in Python — independent of both the Spark plan and the
    DuckDB oracle construction."""
    spans = QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect()
    assert len(spans) > 0, "fixture corpus is known to contain shared spans"

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for row in spans:
        a, b = docs[row["doc_a"]], docs[row["doc_b"]]
        sa, sb, ln = row["start_a"], row["start_b"], row["len_tokens"]
        assert ln >= 20
        assert a[sa : sa + ln] == b[sb : sb + ln], row
        left_open = sa > 0 and sb > 0
        if left_open:
            assert a[sa - 1] != b[sb - 1], f"span extends left: {row}"
        right_open = sa + ln < len(a) and sb + ln < len(b)
        if right_open:
            assert a[sa + ln] != b[sb + ln], f"span extends right: {row}"


def test_cross_doc_spans_pairs_are_cross_document(spark):
    for row in QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect():
        assert row["doc_a"] < row["doc_b"]


def test_duplicate_span_texts_match_both_documents(spark):
    """The surfaced span_text must equal the corresponding token slice of
    BOTH documents (the query reconstructs from doc_a only; equality with
    doc_b is the cross-document guarantee the span stands for)."""
    rows = QUERIES["duplicate_span_texts"](spark, SF_DIR).collect()
    assert len(rows) > 0
    spans = {
        (r["doc_a"], r["doc_b"], r["start_a"]): r
        for r in QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect()
    }
    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        key = (r["doc_a"], r["doc_b"], r["start_a"])
        assert key in spans, f"span_text row without a span: {r}"
        s = spans[key]
        a_slice = docs[r["doc_a"]][r["start_a"] : r["start_a"] + r["len_tokens"]]
        b_slice = docs[s["doc_b"]][s["start_b"] : s["start_b"] + s["len_tokens"]]
        assert r["span_text"] == " ".join(a_slice) == " ".join(b_slice)


def test_streaming_hot_hosts_partitions_the_corpus(spark):
    """Windowed per-host counts must partition the corpus exactly: summing
    n_docs over all (window, host) cells recovers the document count, and
    every host is a canonicalized one (no scheme/www./port residue)."""
    rows = QUERIES["streaming_hot_hosts"](spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert not r["host"].startswith("www.")
        assert ":" not in r["host"]
        assert r["host"] == r["host"].lower()


def test_streaming_content_dedup_matches_batch_fingerprints(spark):
    streamed = {
        r["content_fp"]
        for r in QUERIES["streaming_content_dedup"](spark, SF_SMALL).collect()
    }
    import hashlib

    batch = {
        hashlib.md5(
            re.sub(r"\s+", " ", r["text"].strip().lower()).encode()
        ).hexdigest()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("text")
        .collect()
    }
    assert streamed == batch


def test_streaming_url_dedup_matches_batch_key_set(spark):
    """The streamed first-sight key set must equal the batch canonical-URL
    key set (the composition contract: the same normalizer expression
    feeds both plans, and the watermark horizon out-spans the corpus so
    no key can be dropped or re-emitted)."""
    streamed = {
        r["canonical_url"]
        for r in QUERIES["streaming_url_dedup"](spark, SF_SMALL).collect()
    }
    batch = {
        r["canonical_url"]
        for r in QUERIES["url_normalize_dedup"](spark, SF_SMALL).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def _tok_df(spark, rows):
    """(doc_id, text) fixture -> the (doc_id, toks, n_tokens) frame
    maximal_shared_spans consumes, under the corpus tokenization."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return df.select("doc_id", toks.alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_maximal_shared_spans_fixture_exact(spark):
    """A planted 25-token run flanked by differing tokens must come back
    as exactly one span row with exact offsets and length."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    shared = _words("s", 25)
    rows = [
        (1, _words("a", 3) + " " + shared + " " + _words("z", 4)),
        (2, _words("b", 7) + " " + shared + " " + _words("y", 2)),
        (3, _words("c", 40)),  # no overlap with anyone
    ]
    out = maximal_shared_spans(_tok_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["len_tokens"]) == (3, 7, 25)


def test_maximal_shared_spans_two_runs_same_diagonal(spark):
    """Two distinct shared runs on the SAME alignment diagonal, separated
    by a differing gap, must stay two spans (the island split on gap>1)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    run1, run2 = _words("p", 22), _words("q", 20)
    rows = [
        (1, run1 + " gapone1 " + run2),
        (2, run1 + " gaptwo2 " + run2),
    ]
    out = sorted(
        maximal_shared_spans(_tok_df(spark, rows)).collect(),
        key=lambda r: r["start_a"],
    )
    assert [(r["start_a"], r["len_tokens"]) for r in out] == [(0, 22), (23, 20)]


def test_maximal_shared_spans_short_docs_empty(spark):
    """Docs below the window length produce no windows and no spans (the
    sequence() guard — an unguarded descending sequence would throw)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    rows = [(1, _words("a", 19)), (2, _words("a", 19)), (3, "one")]
    assert maximal_shared_spans(_tok_df(spark, rows)).collect() == []


def test_maximal_shared_spans_hot_bucket_guard_fires(spark):
    """A window hash whose multiplicity exceeds max_mult must fail LOUDLY
    with the remediation message, never expand O(cnt^2) silently."""
    import pytest

    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    boiler = _words("w", 20)
    rows = [(i, boiler) for i in range(5)]  # multiplicity 5 > max_mult 4
    with pytest.raises(Exception, match="multiplicity over 4"):
        maximal_shared_spans(_tok_df(spark, rows), max_mult=4).collect()
