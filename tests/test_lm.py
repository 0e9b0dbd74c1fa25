"""Laws for the n-gram LM quality scorer (operators/lm.py, r19 library
capability — no registry entry per the post-saturation policy; these
laws + the hypothesis sweep + the in-suite DuckDB oracle gate ARE the
gate). Counts are exact integers so the merge/incremental laws are
frame equality; scores are double sums so the score laws compare at
1e-6 (round-6 is the package's float-export convention, and a float
sum's association order is engine-internal — the count frames, not the
rounded doubles, carry the bit-exactness guarantee)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.lm import (
    _LM_K,
    LM_PPL_ORACLE,
    lm_merge,
    lm_score,
    lm_train,
    lm_vocab_size,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def _docs(spark, rows):
    if not rows:
        return spark.createDataFrame([], "doc_id long, text string")
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _model_counts(texts):
    """Exact Python twin of lm_train over the whitespace convention
    (split('') == [''] — the empty-token rule tokens_col documents)."""
    import re

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = re.split(r"\s+", t.strip().lower())
        for w1, w2 in zip(toks, toks[1:]):
            uni[w1] += 1
            bi[(w1, w2)] += 1
    return uni, bi


def _model_score(text, uni, bi, v, k=_LM_K):
    import re

    toks = re.split(r"\s+", text.strip().lower())
    n = max(len(toks) - 1, 0)
    if v == 0:  # empty model defines no distribution (the ANSI-div guard)
        return n, None, None
    lps = [
        math.log((bi.get((w1, w2), 0) + k) / (uni.get(w1, 0) + k * v))
        for w1, w2 in zip(toks, toks[1:])
    ]
    if not lps:
        return 0, None, None
    lp = sum(lps)
    return len(lps), lp, math.exp(-lp / len(lps))


def test_merge_is_lossless_and_commutative(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = lm_train(docs)
    ab, ba = lm_merge(lm_train(a), lm_train(b)), lm_merge(lm_train(b), lm_train(a))
    for got in (ab, ba):
        assert _rows(got.unigrams) == _rows(whole.unigrams)
        assert _rows(got.bigrams) == _rows(whole.bigrams)


def test_incremental_days_equal_rebuild(spark):
    """The maintenance law: folding three daily deltas equals the
    from-scratch model over the concatenated corpus — the model never
    re-scans prior days (the daily-cycle pattern at model level)."""
    docs = load_table(spark, SF_DIR, "documents")
    days = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    folded = lm_train(days[0])
    for d in days[1:]:
        folded = lm_merge(folded, lm_train(d))
    whole = lm_train(docs)
    assert _rows(folded.unigrams) == _rows(whole.unigrams)
    assert _rows(folded.bigrams) == _rows(whole.bigrams)


def test_scores_match_duckdb_oracle(spark):
    """The driver-equivalent gate: the full chain (tokenize → transitions
    → counts → add-k smoothing → log sum → perplexity) recomputed by
    DuckDB over the documents fixture. Integers exact; doubles at 1e-6
    (empirically bit-identical at round 6 on the fixture)."""
    docs = load_table(spark, SF_DIR, "documents")
    got = (
        lm_score(docs, lm_train(docs))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(LM_PPL_ORACLE).df()
    assert len(got) == len(want) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_transitions"].values == want["n_transitions"].values).all()
    assert np.allclose(got["logprob"], want["logprob"], atol=1e-6, equal_nan=True)
    assert np.allclose(got["ppl"], want["ppl"], atol=1e-6, equal_nan=True)


def test_short_docs_carry_null_scores(spark):
    """Docs with < 2 tokens have no transitions: n_transitions 0, NULL
    logprob/ppl — never a crash, never a fabricated score. The empty
    string counts ONE empty token (the tokens_col convention)."""
    model = lm_train(_docs(spark, [(0, "a b c"), (1, "a c b a")]))
    got = {
        r["doc_id"]: (r["n_transitions"], r["logprob"], r["ppl"])
        for r in lm_score(
            _docs(spark, [(10, "single"), (11, ""), (12, "a b")]), model
        ).collect()
    }
    assert got[10] == (0, None, None)
    assert got[11] == (0, None, None)
    assert got[12][0] == 1 and got[12][1] is not None


def test_unseen_context_backs_off_to_uniform(spark):
    """A transition whose context never appeared in training scores
    exactly log(1/V) — the coalesce-0 path through the same formula,
    no special case, no -inf."""
    model = lm_train(_docs(spark, [(0, "a b c"), (1, "b c a")]))
    v = lm_vocab_size(model).collect()[0]["v"]
    r = lm_score(_docs(spark, [(10, "zz qq")]), model).collect()[0]
    assert r["n_transitions"] == 1
    assert abs(r["logprob"] - round(math.log(1.0 / v), 6)) < 1e-9


def test_score_plan_shape(spark):
    """Plan pins: transitions are generated IN-ARRAY (no positional
    self-join — at most the two model joins + the doc-id fold), no
    CartesianProduct, and the only BroadcastNestedLoopJoin is the
    designed single-row V ride-in."""
    import re

    from flink_stream_processing_spark.plans import formatted_plan

    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(lm_score(docs, lm_train(docs)))
    assert "CartesianProduct" not in plan, plan
    # each node id prints twice in explain("formatted") (tree + details)
    bnlj = set(re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
    assert len(bnlj) <= 1, plan


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e1"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    batch=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "zz"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.sampled_from([0.1, 1.0, 2.0]),
)
def test_lm_equals_python_model(spark_global, corpus, batch, k):
    """Hypothesis sweep vs the exact Python model: train on random
    corpora (empty docs included — the [''] token rule), score a
    random batch at swept k; counts and scores must match."""
    spark = spark_global
    train_rows = [(i, t) for i, t in enumerate(corpus)]
    batch_rows = [(100 + i, t) for i, t in enumerate(batch)]
    model = lm_train(_docs(spark, train_rows))
    uni, bi = _model_counts(corpus)
    assert {(r["w1"], r["n1"]) for r in model.unigrams.collect()} == set(
        uni.items()
    )
    assert {(r["w1"], r["w2"], r["n2"]) for r in model.bigrams.collect()} == {
        (w1, w2, n) for (w1, w2), n in bi.items()
    }
    v = len(uni)
    got = {
        r["doc_id"]: r
        for r in lm_score(_docs(spark, batch_rows), model, k=k).collect()
    }
    for i, t in enumerate(batch):
        n, lp, ppl = _model_score(t, uni, bi, v, k)
        r = got[100 + i]
        assert r["n_transitions"] == n, t
        if lp is None:  # no transitions, or the empty-model guard
            assert r["logprob"] is None and r["ppl"] is None, t
        else:
            assert abs(r["logprob"] - lp) < 1e-6, t
            assert abs(r["ppl"] - ppl) < 1e-6, t


def test_empty_model_scores_null_not_divide_by_zero(spark):
    """A model trained on a corpus with NO transitions (all docs < 2
    tokens) defines no distribution: every score is NULL — under Spark
    4's ANSI mode the unguarded smoothing denominator (0 + k·0) would
    be a runtime DIVIDE_BY_ZERO, which is exactly what hypothesis
    caught (the guard keeps the division in the untaken CASE branch)."""
    model = lm_train(_docs(spark, [(0, "solo"), (1, "")]))
    assert lm_vocab_size(model).collect()[0]["v"] == 0
    got = {
        r["doc_id"]: (r["n_transitions"], r["logprob"], r["ppl"])
        for r in lm_score(_docs(spark, [(10, "a b c"), (11, "x")]), model).collect()
    }
    assert got[10] == (2, None, None)
    assert got[11] == (0, None, None)


def test_lm_counts_are_streaming_transparent(spark, tmp_path):
    """Stream ≡ batch for the LM count state (the per-store streaming-
    refresh family): folding lm_merge over a real file stream's
    micro-batches equals the batch model over the full corpus — count
    frames exactly, scores follow."""
    from flink_stream_processing_spark.operators.lm import LMModel
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "lm_stream")
    docs.repartition(3).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state: dict = {"model": None}

    def refresh(batch_df, _batch_id):
        delta = LMModel(
            *[df.localCheckpoint(eager=True) for df in lm_train(batch_df)]
        )
        state["model"] = (
            delta
            if state["model"] is None
            else LMModel(
                *[
                    df.localCheckpoint(eager=True)
                    for df in lm_merge(state["model"], delta)
                ]
            )
        )

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2

    whole = lm_train(docs)
    assert _rows(state["model"].unigrams) == _rows(whole.unigrams)
    assert _rows(state["model"].bigrams) == _rows(whole.bigrams)
