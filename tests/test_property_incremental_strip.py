"""Property-based test (hypothesis): the incremental span strip equals a
brute-force Python reference on random tiny-alphabet corpora.

The deterministic tests in test_web_dedup_stream.py cover planted shapes;
this sweeps random ones — overlapping matched windows (gap < W between
matched starts), gapped islands, full-coverage docs, docs shorter than
the window, batch docs matching several corpus docs at once. Window size
3 over alphabet {a, b} maximizes hash-set hits per corpus size, which is
exactly the regime where interval merging and the exists-union coverage
can disagree with a naive per-window union if either is wrong.

Reference semantics (mirrors the operator contract): covered positions =
union over every batch-doc window whose token tuple appears among the
corpus's windows; affected docs only; removed_tokens counts each covered
position once; clean_text is the uncovered tokens joined by spaces.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
    incremental_strip_new_docs,
    span_hash_store,
)

W = 3
DOC = st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=12)


def _ref_strip(corpus_docs, batch_docs, w):
    store = set()
    for toks in corpus_docs:
        for i in range(len(toks) - w + 1):
            store.add(tuple(toks[i : i + w]))
    out = {}
    for doc_id, toks in batch_docs:
        covered = set()
        for i in range(len(toks) - w + 1):
            if tuple(toks[i : i + w]) in store:
                covered.update(range(i, i + w))
        if covered:
            kept = [t for j, t in enumerate(toks) if j not in covered]
            out[doc_id] = (len(toks), len(covered), " ".join(kept))
    return out


def _tok_frame(spark, rows):
    return spark.createDataFrame(
        [(i, toks, len(toks)) for i, toks in rows],
        "doc_id long, toks array<string>, n_tokens long",
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(DOC, min_size=1, max_size=4),
    batch=st.lists(DOC, min_size=1, max_size=4),
)
def test_incremental_strip_equals_brute_force(spark_global, corpus, batch):
    spark = spark_global
    corpus_rows = list(enumerate(corpus))
    batch_rows = [(100 + i, toks) for i, toks in enumerate(batch)]
    store = span_hash_store(_tok_frame(spark, corpus_rows), window=W)
    got = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["clean_text"])
        for r in incremental_strip_new_docs(
            _tok_frame(spark, batch_rows), store, window=W
        ).collect()
    }
    want = _ref_strip([t for _, t in corpus_rows], batch_rows, W)
    assert got == want
