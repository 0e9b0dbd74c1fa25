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
