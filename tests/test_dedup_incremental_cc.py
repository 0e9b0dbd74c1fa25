"""Laws for incremental connected components (operators/dedup.py
``cc_incremental``, r17 library capability — no registry entry per the
post-saturation policy; these laws plus the hypothesis sweep against an
exact union-find model and the opt-in scale rung ARE the gate)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.dedup import (
    cc_incremental,
    connected_components,
)


def _pairs(spark, rows):
    if not rows:
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _rowset(df):
    return sorted((r["node"], r["lbl"]) for r in df.collect())


def _uf_partition(edges, extra_nodes=()):
    """Exact reference: union-find -> {node: min member of its component}."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for n in extra_nodes:
        find(n)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        lo = min(members)
        for n in members:
            out[n] = lo
    return sorted(out.items())


def test_cc_incremental_equals_rebuild_on_merges_and_new_nodes(spark):
    """Rebuild equivalence, exact: a batch that bridges two existing
    components, adds an internal edge, and introduces brand-new nodes
    yields EXACTLY cc(E1 ∪ E2) — same partition, same canonical
    min-member labels."""
    e1 = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    e2 = _pairs(spark, [(3, 10), (30, 31), (1, 3)])
    labels = connected_components(e1)
    inc = cc_incremental(labels, e2)
    full = connected_components(e1.unionByName(e2))
    assert _rowset(inc) == _rowset(full)
    assert (31, 30) in _rowset(inc)  # new nodes entered


def test_cc_incremental_idempotent_on_empty_and_internal_batches(spark):
    """An empty batch and a batch of already-internal edges both return
    the labeling unchanged — including components the batch never
    touches (the star-edge universe excludes them; the anti-join
    re-attach must bring them back, not drop them)."""
    e1 = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    labels = connected_components(e1)
    base = _rowset(labels)
    assert _rowset(cc_incremental(labels, _pairs(spark, []))) == base
    assert _rowset(cc_incremental(labels, _pairs(spark, [(2, 3), (10, 11)]))) == base


def test_cc_incremental_preserves_singletons(spark):
    """A hand-built labeling containing true singletons (node == lbl, no
    star edge) survives a batch that touches other components — the
    singleton is invisible to the edge-derived node universe and must be
    re-attached unchanged."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (10, 10), (11, 10)], "node long, lbl long"
    )
    out = _rowset(cc_incremental(labels, _pairs(spark, [(1, 10)])))
    assert (7, 7) in out
    assert out == [(1, 1), (2, 1), (7, 7), (10, 1), (11, 1)]


def test_cc_incremental_labels_only_decrease(spark):
    """Monotonicity: a merge adopts the smaller component minimum, so no
    node's label ever increases across an incremental step, and every
    input node survives."""
    e1 = _pairs(spark, [(5, 6), (100, 101)])
    labels = connected_components(e1)
    before = dict(_rowset(labels))
    after = dict(_rowset(cc_incremental(labels, _pairs(spark, [(6, 100)]))))
    assert set(after) >= set(before)
    assert all(after[n] <= before[n] for n in before)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    e1=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=12
    ),
    e2=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=8
    ),
)
def test_cc_incremental_equals_union_find_model(spark_global, e1, e2):
    """Random-graph sweep against an exact Python union-find: the
    incremental result over (cc(E1), E2) must match the model partition
    of E1 ∪ E2 — an independent reference, not a Spark rebuild."""
    spark = spark_global
    labels = connected_components(_pairs(spark, e1))
    inc = cc_incremental(labels, _pairs(spark, e2))
    assert _rowset(inc) == _uf_partition(e1 + e2)


def test_cc_local_fast_path_matches_distributed_loop(spark):
    """r20: small graphs take the single-task numpy path; its (node, lbl)
    output must be bit-identical to the distributed propagation loop on
    the same edges — longs AND strings — and the gate must respect the
    kill switch / edge-count bound env overrides."""
    import os

    rows = [
        (1, 2), (2, 3), (3, 1),          # triangle
        (10, 11), (11, 12),              # chain
        (5, 5),                          # self loop
        (100, 7), (7, 100),              # both directions + dup
    ]
    pairs = _pairs(spark, rows)

    def run(**env):
        saved = {k: os.environ.get(k) for k in env}
        try:
            for k, v in env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            return _rowset(connected_components(pairs))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    local = run(SPARK_GRAFT_NO_LOCAL_CC=None)
    dist = run(SPARK_GRAFT_NO_LOCAL_CC="1")
    assert local == dist
    # bound of 0 edges forces the distributed loop too
    tiny_bound = run(SPARK_GRAFT_CC_LOCAL_MAX_EDGES="0")
    assert tiny_bound == dist

    # string node ids (entity-resolution shape): same equivalence
    srows = [("b", "c"), ("c", "d"), ("x", "y")]
    spairs = spark.createDataFrame(srows, "doc_a string, doc_b string")
    sl = sorted(
        (r["node"], r["lbl"]) for r in connected_components(spairs).collect()
    )
    saved = os.environ.get("SPARK_GRAFT_NO_LOCAL_CC")
    os.environ["SPARK_GRAFT_NO_LOCAL_CC"] = "1"
    try:
        sd = sorted(
            (r["node"], r["lbl"]) for r in connected_components(spairs).collect()
        )
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_NO_LOCAL_CC", None)
        else:
            os.environ["SPARK_GRAFT_NO_LOCAL_CC"] = saved
    assert sl == sd
    assert sl == [("b", "b"), ("c", "b"), ("d", "b"), ("x", "x"), ("y", "x")]
