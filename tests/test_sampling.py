"""Laws for the mergeable weighted reservoir (operators/sampling.py,
r17 library capability — no registry entry per the post-saturation
policy; these laws plus the hypothesis sweep against an exact Python
model ARE the gate). Keys are seeded-md5 deterministic, so every law is
pinned with exact frame equality."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.sampling import (
    ares_keyed,
    reservoir_merge,
    weighted_reservoir,
)


def _items(spark, rows):
    """rows: [(doc_id, weight)]"""
    if not rows:
        return spark.createDataFrame([], "doc_id long, w double")
    return spark.createDataFrame(rows, "doc_id long, w double")


def _sample(df):
    return sorted((r["doc_id"], r["ares_key"]) for r in df.collect())


def test_reservoir_matches_registered_query_construction(spark):
    """The library key construction is byte-identical to the registered
    weighted_sample_ares query's (same seed, same md5-uniform, same
    rounding) on the documents fixture — the two surfaces can never
    disagree on a sample."""
    from flink_stream_processing_spark.queries_impl.llm_pipeline3 import (
        q_weighted_sample_ares,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("double").alias("w"))
    )
    lib = weighted_reservoir(ares_keyed(docs, "w"), 50).select(
        "doc_id", "ares_key"
    )
    query = q_weighted_sample_ares(spark, SF_DIR).select("doc_id", "ares_key")
    assert _sample(lib) == _sample(query)


def test_reservoir_shard_merge_is_exact(spark):
    """reservoir(A ∪ B) == merge(res(A), res(B)) for a disjoint split —
    exact frame equality; shards sample independently and the corpus is
    never re-ranked."""
    rows = [(i, float(1 + i % 7)) for i in range(2_000)]
    keyed = ares_keyed(_items(spark, rows), "w")
    whole = weighted_reservoir(keyed, 40)
    a = weighted_reservoir(keyed.filter(F.col("doc_id") % 2 == 0), 40)
    b = weighted_reservoir(keyed.filter(F.col("doc_id") % 2 == 1), 40)
    assert _sample(reservoir_merge(a, b, 40)) == _sample(whole)


def test_reservoir_merge_idempotent_on_overlap(spark):
    """merge(s, s) == s, and merging overlapping shards counts each item
    once — the id dedup is safe because the key is a pure function of
    (id, weight)."""
    rows = [(i, float(1 + i % 5)) for i in range(500)]
    keyed = ares_keyed(_items(spark, rows), "w")
    res = weighted_reservoir(keyed, 25)
    assert _sample(reservoir_merge(res, res, 25)) == _sample(res)
    overlap_a = weighted_reservoir(keyed.filter(F.col("doc_id") < 400), 25)
    overlap_b = weighted_reservoir(keyed.filter(F.col("doc_id") >= 200), 25)
    assert _sample(reservoir_merge(overlap_a, overlap_b, 25)) == _sample(
        weighted_reservoir(keyed, 25)
    )


def test_reservoir_prefix_property_and_bound(spark):
    """The k-reservoir is a prefix of the (k+1)-reservoir under the
    (key, id) order, and a merge never exceeds k rows."""
    rows = [(i, 1.0 + (i % 3)) for i in range(300)]
    keyed = ares_keyed(_items(spark, rows), "w")
    k10 = [d for d, _ in _sortedk(keyed, 10)]
    k11 = [d for d, _ in _sortedk(keyed, 11)]
    assert k11[:10] == k10
    merged = reservoir_merge(
        weighted_reservoir(keyed, 10), weighted_reservoir(keyed, 10), 10
    )
    assert merged.count() == 10


def _sortedk(keyed, k):
    return [
        (r["doc_id"], r["ares_key"])
        for r in weighted_reservoir(keyed, k).orderBy("ares_key", "doc_id").collect()
    ]


def test_reservoir_plan_is_topk_heap_not_global_sort(spark):
    """Plan pin: the reservoir is TakeOrderedAndProject (per-partition
    heaps merged on the driver) — a global Sort would be a 100 TB
    scale-killer for a k-row sample."""
    from flink_stream_processing_spark.plans.inspect import formatted_plan

    rows = [(i, 1.0) for i in range(100)]
    plan = formatted_plan(weighted_reservoir(ares_keyed(_items(spark, rows), "w"), 5))
    assert "TakeOrderedAndProject" in plan


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(1, 9), min_size=0, max_size=25),
    k=st.integers(1, 8),
    split=st.integers(0, 25),
)
def test_reservoir_merge_equals_python_model(spark_global, weights, k, split):
    """Random sweep: shard-merge at an arbitrary split point equals the
    exact Python model — read the deterministic keys back once, sort by
    (key, id) in Python, take k. Independent of Spark's top-k path."""
    spark = spark_global
    rows = [(i, float(w)) for i, w in enumerate(weights)]
    keyed = ares_keyed(_items(spark, rows), "w")
    all_keys = sorted(
        ((r["ares_key"], r["doc_id"]) for r in keyed.collect())
    )
    model = sorted((d, key) for key, d in all_keys[:k])
    a = weighted_reservoir(keyed.filter(F.col("doc_id") < split), k)
    b = weighted_reservoir(keyed.filter(F.col("doc_id") >= split), k)
    assert _sample(reservoir_merge(a, b, k)) == model
