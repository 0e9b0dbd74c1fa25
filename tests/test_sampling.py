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


def test_reservoir_merge_deterministic_under_weight_drift(spark):
    """Drift determinism (r17 ADVICE): the same id arriving with DIFFERENT
    weights across the two inputs (outside the pure-function contract)
    must merge to ONE well-defined row — the minimum-(ares_key, …) one,
    i.e. the highest-weight variant — independent of argument order,
    never an arbitrary dropDuplicates survivor."""
    low = ares_keyed(_items(spark, [(i, 1.0) for i in range(20)]), "w")
    high = ares_keyed(_items(spark, [(i, 9.0) for i in range(10)]), "w")
    ab = reservoir_merge(low, high, 15).collect()
    ba = reservoir_merge(high, low, 15).collect()
    assert sorted(map(tuple, ab)) == sorted(map(tuple, ba))
    drifted = {r["doc_id"]: r["w"] for r in ab if r["doc_id"] < 10}
    assert drifted and all(w == 9.0 for w in drifted.values())


def test_reservoir_u_clamp_never_yields_null_keys(spark):
    """The (0, 1] clamp (r17 ADVICE): no id can produce a null ares_key —
    even the pathological md5-prefix-00000000 case maps to u = 2^-32 —
    and the clamp leaves every fixture key bit-identical to the
    registered query's (pinned by
    test_reservoir_matches_registered_query_construction)."""
    keyed = ares_keyed(_items(spark, [(i, 1.0) for i in range(5_000)]), "w")
    assert keyed.filter(F.col("ares_key").isNull()).count() == 0
    # the clamp's output for the would-be-zero integer is finite and max
    # (u = 2^-32 -> key = -ln(2^-32)/w = 32 ln 2, the largest possible)
    import math

    assert abs(-math.log(1.0 / 4294967296.0) - 32 * math.log(2)) < 1e-9


def test_reservoir_foreachbatch_refresh_equals_batch(spark, tmp_path):
    """Stream ≡ batch (the r18 streaming-refresh pin, completing the
    mergeable-store family: HLL max / bloom or / histogram add /
    reservoir merge): folding reservoir_merge over the micro-batches of
    a real file stream — the foreachBatch refresh a standing sample
    panel runs — yields EXACTLY the one-shot batch reservoir over the
    same rows. Multiple micro-batches are forced (maxFilesPerTrigger=1
    over a 4-file layout) so the fold genuinely exercises the merge."""
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    k = 40
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("double").alias("w"))
    )
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("doc_id long, w double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state = {"rows": []}

    def refresh(batch_df, _batch_id):
        batch_res = weighted_reservoir(ares_keyed(batch_df, "w"), k)
        if state["rows"]:
            held = batch_df.sparkSession.createDataFrame(
                state["rows"], "doc_id long, w double, ares_key double"
            )
            batch_res = reservoir_merge(held, batch_res, k)
        state["rows"] = [
            (r["doc_id"], r["w"], r["ares_key"]) for r in batch_res.collect()
        ]

    q = stream.writeStream.foreachBatch(refresh).trigger(
        availableNow=True
    ).start()
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "stream collapsed into one micro-batch"

    want = sorted(
        (r["doc_id"], r["ares_key"])
        for r in weighted_reservoir(ares_keyed(docs, "w"), k).collect()
    )
    got = sorted((d, key) for d, _w, key in state["rows"])
    assert got == want and len(want) == k


def test_reservoir_merge_tolerates_unorderable_payload_columns(spark):
    """r18 ADVICE: a map-typed payload column must not break the merge
    (the r17 drift-dedup ordered by EVERY non-id column, which raises
    AnalysisException for unorderable types). The dedup now tiebreaks on
    ares_key + the ORDERABLE payload columns only; overlap still
    survives exactly once and the pick stays deterministic in argument
    order."""
    rows = [(i, 1.0, {"s": str(i)}) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double, meta map<string,string>")
    keyed = ares_keyed(df, "w")
    a = keyed.filter(F.col("doc_id") < 15)
    b = keyed.filter(F.col("doc_id") >= 5)  # ids 5..14 overlap
    ab = reservoir_merge(a, b, 12)
    ba = reservoir_merge(b, a, 12)
    got = [(r["doc_id"], r["ares_key"]) for r in ab.collect()]
    assert len(got) == 12 and len({d for d, _ in got}) == 12
    assert sorted(got) == sorted(
        (r["doc_id"], r["ares_key"]) for r in ba.collect()
    )
    # full-frame check: the map column rides through untouched
    assert {r["meta"]["s"] for r in ab.collect()} == {
        str(d) for d, _ in got
    }

