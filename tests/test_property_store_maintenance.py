"""Property-based test (hypothesis): store maintenance equals a
brute-force Python set model on random tiny-alphabet corpora.

The deterministic tests in test_store_maintenance.py pin the laws on the
fixture's %10 split; this sweeps random shapes — batches fully inside
the store, fully novel batches, empty-overlap partitions, duplicate keys
within a batch, and multi-generation appends — against the obvious set
semantics: delta = batch_keys - store, gen2 = store ∪ delta, and a
second generation built on gen2 must behave identically to a store
built from scratch over corpus ∪ b1 (the probe-equivalence law, swept
here at the key-set level where the reference is exact)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_stream_processing_spark.queries_impl.store_maintenance import (
    _N_BUCKETS,
    compacted_store,
    compaction_report,
    store_append_delta,
)

# Tiny alphabet of md5-shaped keys: the operator contract says keys are
# hex digests, and the bucket id reads the first 8 hex chars — use fixed
# 32-char hex strings so bucket routing is exercised for real.
KEY = st.integers(min_value=0, max_value=30).map(lambda i: f"{i:032x}")
KEYS = st.lists(KEY, min_size=0, max_size=12)


def _frame(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(store_keys=KEYS, b1=KEYS, b2=KEYS)
def test_maintenance_equals_set_model(spark_global, store_keys, b1, b2):
    spark = spark_global
    store_set = set(store_keys)
    store = _frame(spark, sorted(store_set))  # store is distinct by contract

    # generation 1 -> 2
    delta = store_append_delta(store, _frame(spark, b1), "k")
    got_delta = {r["k"] for r in delta.collect()}
    assert got_delta == set(b1) - store_set

    gen2 = compacted_store(store, _frame(spark, sorted(got_delta)), "k")
    rows = gen2.collect()
    got_gen2 = {r["k"] for r in rows}
    assert got_gen2 == store_set | set(b1)
    assert len(rows) == len(got_gen2)  # distinct by construction
    assert all(0 <= r["bucket_id"] < _N_BUCKETS for r in rows)
    assert all(r["is_new"] == (r["k"] not in store_set) for r in rows)

    report = compaction_report(gen2).collect()
    assert sum(r["n_total"] for r in report) == len(got_gen2)
    assert sum(r["n_new"] for r in report) == len(got_delta)

    # generation 2 -> 3: the maintained store is indistinguishable from a
    # from-scratch store over corpus ∪ b1
    delta2 = store_append_delta(
        gen2.select("k"), _frame(spark, b2), "k"
    )
    assert {r["k"] for r in delta2.collect()} == set(b2) - (store_set | set(b1))

    # idempotent replay: re-presenting b1 against gen2 writes nothing
    replay = store_append_delta(gen2.select("k"), _frame(spark, b1), "k")
    assert replay.count() == 0


# --- tombstone sweep: refcount purge equals an exact Python window model ----

# Docs are concatenations of passages drawn from a tiny shared pool, so
# W-token windows genuinely collide across docs (random tokens never
# would: the window space is vocab^W). The model recomputes every
# doc's distinct window hashes with hashlib.md5 — the operator's exact
# convention (md5 of the space-joined W-token slice) — then derives
# holder counts, decrements, and the purge set with plain dict
# arithmetic.

import hashlib

from pyspark.sql import functions as F

from flink_stream_processing_spark.queries_impl.store_maintenance import (
    purged_refcount_store,
    span_refcount_store,
    tombstone_decrements,
)
from flink_stream_processing_spark.queries_impl.web_dedup_stream import _SPAN_W

_POOL = [[f"w{p}t{i}" for i in range(11)] for p in range(4)]  # 4 passages x 11 toks

DOC = st.lists(
    st.integers(min_value=0, max_value=3), min_size=1, max_size=4
).map(lambda picks: [t for p in picks for t in _POOL[p]])
CORPUS = st.lists(st.tuples(DOC, st.booleans()), min_size=1, max_size=5)


def _model_windows(toks):
    return {
        hashlib.md5(" ".join(toks[i : i + _SPAN_W]).encode()).hexdigest()
        for i in range(max(len(toks) - _SPAN_W + 1, 0))
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_tombstone_purge_equals_window_model(spark_global, corpus):
    spark = spark_global
    docs = [(i, toks) for i, (toks, _) in enumerate(corpus)]
    removed_ids = [i for i, (_, rm) in enumerate(corpus) if rm]

    # exact model: per-hash holder counts, decrements, purge arithmetic
    wins = {i: _model_windows(toks) for i, toks in docs}
    holders: dict[str, int] = {}
    decs: dict[str, int] = {}
    for i, ws in wins.items():
        for h in ws:
            holders[h] = holders.get(h, 0) + 1
            if i in removed_ids:
                decs[h] = decs.get(h, 0) + 1

    frame = spark.createDataFrame(
        [(i, toks, len(toks)) for i, toks in docs],
        "doc_id long, toks array<string>, n_tokens long",
    )
    removed = frame.filter(F.col("doc_id").isin(removed_ids)) if removed_ids else (
        frame.filter(F.lit(False))
    )
    after = purged_refcount_store(
        span_refcount_store(frame), tombstone_decrements(removed)
    ).collect()

    got = {r["h"]: (r["n_holders"], r["n_dec"], r["n_after"]) for r in after}
    want = {
        h: (n, decs.get(h, 0), n - decs.get(h, 0)) for h, n in holders.items()
    }
    assert got == want
    # the post-purge store equals the model's surviving holder counts
    surviving: dict[str, int] = {}
    for i, ws in wins.items():
        if i not in removed_ids:
            for h in ws:
                surviving[h] = surviving.get(h, 0) + 1
    assert {
        r["h"]: r["n_after"] for r in after if r["n_after"] > 0
    } == surviving


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_refcount_append_equals_window_model(spark_global, corpus):
    """Random-shape sweep of the refcount append (empty corpus, empty
    batch, full-overlap batches — the full-outer-join edge cases): the
    boolean marks batch membership; appending the batch docs to a store
    built over the rest must equal the model's holder counts over ALL
    docs."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        refcount_store_append,
    )

    spark = spark_global
    docs = [(i, toks) for i, (toks, _) in enumerate(corpus)]
    batch_ids = {i for i, (_, b) in enumerate(corpus) if b}

    holders: dict[str, int] = {}
    for i, toks in docs:
        for h in _model_windows(toks):
            holders[h] = holders.get(h, 0) + 1

    frame = spark.createDataFrame(
        [(i, toks, len(toks)) for i, toks in docs],
        "doc_id long, toks array<string>, n_tokens long",
    )
    corpus_frame = frame.filter(~F.col("doc_id").isin(list(batch_ids) or [-1]))
    batch_frame = frame.filter(F.col("doc_id").isin(list(batch_ids) or [-1]))
    got = {
        r["h"]: r["n_holders"]
        for r in refcount_store_append(
            span_refcount_store(corpus_frame), batch_frame
        ).collect()
    }
    assert got == holders


# --- quantizer-state sweep: IVF append/remove equals an exact dict model ----

# Integer-valued vectors keep every sum an exact double, so the Python
# model (per-label per-dim sums and counts in a dict) is an EXACT
# reference — no tolerance anywhere in this sweep. Random maintenance
# sequences cover: removals emptying a label, appends introducing a new
# label, interleaved append→remove→append chains, and the degenerate
# empty-batch verbs.
_DIM = 3
VEC = st.lists(
    st.integers(min_value=-9, max_value=9).map(float), min_size=_DIM, max_size=_DIM
)
LABELED_VECS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), VEC), min_size=0, max_size=10
)


def _vec_frame(spark, rows, start_id=0):
    data = [(start_id + i, lab, v) for i, (lab, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "vec_id long, label int, embedding array<double>"
    )


def _model_state(rows):
    """Exact dict model: {(label, dim): [sum, count]}."""
    m: dict = {}
    for lab, v in rows:
        for d, x in enumerate(v):
            cell = m.setdefault((lab, d), [0.0, 0])
            cell[0] += x
            cell[1] += 1
    return m


def _state_rows(state_df):
    return {(r["label"], r["dim"]): (r["s"], r["n"]) for r in state_df.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=LABELED_VECS, batch=LABELED_VECS, n_remove=st.integers(0, 10))
def test_ivf_state_maintenance_equals_dict_model(
    spark_global, corpus, batch, n_remove
):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_centroid_state,
        ivf_state_append,
        ivf_state_remove,
    )

    spark = spark_global
    state0 = ivf_centroid_state(_vec_frame(spark, corpus))
    model = _model_state(corpus)
    assert _state_rows(state0) == {
        k: (s, n) for k, (s, n) in model.items()
    }

    # append a batch (may introduce brand-new labels)
    state1 = ivf_state_append(state0, _vec_frame(spark, batch, start_id=1000))
    for lab, v in batch:
        for d, x in enumerate(v):
            cell = model.setdefault((lab, d), [0.0, 0])
            cell[0] += x
            cell[1] += 1
    assert _state_rows(state1) == {k: (s, n) for k, (s, n) in model.items()}

    # remove a prefix of the appended batch (possibly all of it, possibly
    # emptying labels the corpus never had)
    removed = batch[:n_remove]
    state2 = ivf_state_remove(state1, _vec_frame(spark, removed, start_id=1000))
    for lab, v in removed:
        for d, x in enumerate(v):
            cell = model[(lab, d)]
            cell[0] -= x
            cell[1] -= 1
    want = {k: (s, n) for k, (s, n) in model.items() if n > 0}
    assert _state_rows(state2) == want


# --- rebalance sweep: ivf_split_overloaded's algebraic laws on random lists --

# Exact assignment is the planted-fixture tests' job (well-separated
# blobs have a unique right answer); this sweep checks the laws that
# must hold on ANY input: the output ids partition the input ids, lists
# at-or-under the threshold pass through with their labels unchanged,
# child labels never collide with existing labels, and every emitted
# split has exactly two nonempty children covering the parent's members.


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=LABELED_VECS, threshold=st.integers(1, 6))
def test_ivf_split_laws_on_random_lists(spark_global, rows, threshold):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_split_overloaded,
    )

    spark = spark_global
    lists = _vec_frame(spark, rows)
    reb, smap = ivf_split_overloaded(lists, threshold=threshold)
    out = reb.collect()
    splits = smap.collect()

    in_by_id = {start_id: (lab, v) for start_id, (lab, v) in enumerate(rows)}
    assert sorted(r["vec_id"] for r in out) == sorted(in_by_id)  # partition

    from collections import Counter

    in_counts = Counter(lab for lab, _ in rows)
    existing = set(in_counts)
    split_parents = {r["parent_label"] for r in splits}
    child_by_parent: dict = {}
    for r in splits:
        child_by_parent.setdefault(r["parent_label"], {})[r["sub"]] = (
            r["child_label"],
            r["n_members"],
        )

    for r in out:
        lab0, v0 = in_by_id[r["vec_id"]]
        assert r["embedding"] == v0  # vectors never change
        if lab0 not in split_parents:
            assert r["label"] == lab0  # untouched lists keep their labels

    for parent, kids in child_by_parent.items():
        assert in_counts[parent] > threshold  # only overloaded lists split
        assert set(kids) == {0, 1}
        assert kids[0][0] == parent  # sub 0 keeps the parent label
        assert kids[1][0] not in existing  # fresh label, no collision
        assert kids[0][1] > 0 and kids[1][1] > 0  # both children nonempty
        assert kids[0][1] + kids[1][1] == in_counts[parent]
        parent_ids = {i for i, (lab, _) in in_by_id.items() if lab == parent}
        child_ids = {
            r["vec_id"] for r in out if r["label"] in (kids[0][0], kids[1][0])
        }
        assert child_ids == parent_ids  # children cover exactly the parent

    # fresh labels are pairwise distinct across simultaneous splits
    fresh = [kids[1][0] for kids in child_by_parent.values()]
    assert len(fresh) == len(set(fresh))
