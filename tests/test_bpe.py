"""Laws for the BPE trainer/encoder (operators/bpe.py, r19 library
capability — no registry entry per the post-saturation policy; these
laws + the hypothesis sweep vs the exact Python reference ARE the gate,
with the registered `bpe_merge_candidates` row carrying the
single-iteration DuckDB oracle). The tie-break is pinned (max count,
then lexicographically smallest pair), so every law is exact list/frame
equality — no "vocab overlap" fuzz."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.bpe import (
    bpe_encode,
    bpe_freq_merge,
    bpe_merges_df,
    bpe_train,
    bpe_word_freqs,
)
from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def _docs(spark, rows):
    if not rows:
        return spark.createDataFrame([], "doc_id long, text string")
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bpe(texts, n_merges):
    """Exact Python reference (Sennrich et al. 2016 Alg. 1 with the
    pinned tie-break): returns (merge list, {word: pieces})."""
    wfreq: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            wfreq[w] += 1
    vocab = {w: list(w) for w in wfreq}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in wfreq.items():
            p = vocab[w]
            for i in range(len(p) - 1):
                pc[(p[i], p[i + 1])] += f
        if not pc:
            break
        mx = max(pc.values())
        best = min(k for k, v in pc.items() if v == mx)
        merges.append(best)
        a, b = best
        for w in vocab:
            p, out, i = vocab[w], [], 0
            while i < len(p):
                if i + 1 < len(p) and p[i] == a and p[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(p[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


_FIXTURE = [
    (0, "low lower lowest low low"),
    (1, "newer new newest wider wide"),
]


def test_textbook_example_learns_textbook_merges(spark):
    """The Sennrich example corpus: merges and decompositions equal the
    exact reference — low/new become single pieces, er/est factor out."""
    model = bpe_train(bpe_word_freqs(_docs(spark, _FIXTURE)), 8)
    pm, pv = _py_bpe([t for _, t in _FIXTURE], 8)
    assert model.merges == pm
    assert {r["word"]: r["pieces"] for r in model.vocab.collect()} == pv
    assert pv["lower"] == ["low", "er"] and pv["newest"] == ["new", "est"]


def test_word_freq_merge_is_lossless(spark):
    docs = load_table(spark, SF_DIR, "documents")
    whole = bpe_word_freqs(docs)
    a = bpe_word_freqs(docs.filter(F.col("doc_id") % 2 == 0))
    b = bpe_word_freqs(docs.filter(F.col("doc_id") % 2 == 1))
    got = sorted(map(tuple, bpe_freq_merge(a, b).collect()))
    assert got == sorted(map(tuple, whole.collect()))


def test_first_merge_agrees_with_registered_candidates_row(spark):
    """Iteration 1 of the trainer and the registered DuckDB-oracled
    `bpe_merge_candidates` query must pick the same pair — the two
    surfaces can never disagree on what BPE learns first. (The
    registered row breaks ties by pair string; the trainer by (a, b) —
    identical orderings for single-char pairs since concatenation is
    order-preserving there.)"""
    top = QUERIES["bpe_merge_candidates"](spark, SF_DIR).limit(1).collect()[0]
    model = bpe_train(
        bpe_word_freqs(load_table(spark, SF_DIR, "documents")), 1
    )
    assert len(model.merges) == 1
    a, b = model.merges[0]
    assert a + b == top["pair"]


def test_encode_reproduces_training_vocab_and_reconstructs(spark):
    """Replaying the learned merge table over the training words equals
    the trained pieces EXACTLY, and concat(pieces) == word always (no
    characters created or lost at any stage)."""
    wf = bpe_word_freqs(_docs(spark, _FIXTURE))
    model = bpe_train(wf, 6)
    enc = bpe_encode(wf, bpe_merges_df(model, spark))
    got = {r["word"]: r["pieces"] for r in enc.collect()}
    assert got == {r["word"]: r["pieces"] for r in model.vocab.collect()}
    assert all("".join(p) == w for w, p in got.items())


def test_zero_merges_is_character_split_and_full_training_collapses(spark):
    wf = bpe_word_freqs(_docs(spark, [(0, "aaab aaab ab")]))
    none = bpe_encode(wf, bpe_merges_df(bpe_train(wf, 0), spark))
    assert {r["word"]: r["pieces"] for r in none.collect()} == {
        "aaab": ["a", "a", "a", "b"],
        "ab": ["a", "b"],
    }
    full = bpe_train(wf, 50)  # stops early once no pairs remain
    assert all(len(r["pieces"]) == 1 for r in full.vocab.collect())
    assert len(full.merges) < 50


def test_encode_plan_is_single_scan_no_real_join(spark):
    """Plan pin: encoding is ONE scan of the word frame — the merge
    table rides in as the collected-array scalar (the allowed
    broadcast-crossJoin), so the only join node is that single-row
    BNLJ; no SortMergeJoin, no CartesianProduct."""
    import re as _re

    from flink_stream_processing_spark.plans import formatted_plan

    wf = bpe_word_freqs(load_table(spark, SF_DIR, "documents"))
    model = bpe_train(wf, 2)
    plan = formatted_plan(bpe_encode(wf, bpe_merges_df(model, spark)))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    bnlj = set(_re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
    assert len(bnlj) <= 1, plan


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=0, max_value=6),
)
def test_bpe_equals_python_reference(spark_global, corpus, n_merges):
    """Hypothesis sweep: merge list AND decompositions equal the exact
    reference on random corpora — order included, ties included (the
    pinned tie-break is what makes this assertable)."""
    spark = spark_global
    rows = [(i, t) for i, t in enumerate(corpus)]
    model = bpe_train(bpe_word_freqs(_docs(spark, rows)), n_merges)
    pm, pv = _py_bpe(corpus, n_merges)
    assert model.merges == pm
    assert {r["word"]: r["pieces"] for r in model.vocab.collect()} == pv


def test_empty_word_round_trips(spark):
    """The package tokenization yields one EMPTY token for an empty doc;
    the char split must give array('') (Spark's sequence(1, 0) counts
    DOWN, not empty — the guarded case), training must not learn merges
    from it, and encoding round-trips."""
    wf = bpe_word_freqs(_docs(spark, [(0, ""), (1, "ab ab")]))
    model = bpe_train(wf, 3)
    vocab = {r["word"]: r["pieces"] for r in model.vocab.collect()}
    assert vocab[""] == [""]
    assert vocab["ab"] == ["ab"]
    assert ("", "") not in model.merges
    enc = bpe_encode(wf, bpe_merges_df(model, spark))
    assert {r["word"]: r["pieces"] for r in enc.collect()} == vocab
