"""Laws for the mergeable bounded-domain histogram (operators/
histogram.py, r17 library capability — no registry entry per the
post-saturation policy; these laws plus the hypothesis sweep against an
exact Python model ARE the gate). Counts are exact integers, so every
law except nothing is pinned with exact equality."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.histogram import (
    histogram_merge,
    histogram_state,
    quantile_bracket,
)


def _vals(spark, xs):
    if not xs:
        return spark.createDataFrame([], "v double")
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def _state_map(state):
    return {r["bin_idx"]: r["n"] for r in state.collect()}


def test_histogram_merge_is_lossless(spark):
    """state(A ∪ B) == merge(state(A), state(B)) exactly — shards
    histogram independently; nothing is approximated at merge time."""
    xs = [i / 1000 for i in range(1000)]
    whole = _state_map(histogram_state(_vals(spark, xs), "v", 0.0, 1.0, bins=64))
    a = histogram_state(_vals(spark, xs[:400]), "v", 0.0, 1.0, bins=64)
    b = histogram_state(_vals(spark, xs[400:]), "v", 0.0, 1.0, bins=64)
    assert _state_map(histogram_merge(a, b)) == whole


def test_histogram_mass_conserved_and_clamped(spark):
    """Total state mass == row count, with out-of-range values clamped
    into the END bins (never dropped — a silent drop would corrupt every
    downstream rank)."""
    xs = [-5.0, -0.1, 0.0, 0.5, 0.999, 1.0, 7.0]
    state = histogram_state(_vals(spark, xs), "v", 0.0, 1.0, bins=10)
    m = _state_map(state)
    assert sum(m.values()) == len(xs)
    assert m[0] >= 3  # -5, -0.1, 0.0
    assert m[9] >= 2  # 1.0, 7.0 clamp into the top bin


def test_quantile_bracket_contains_exact_quantile(spark):
    """Bracket correctness against a literal sort: for a sweep of q, the
    exact q-quantile (the ceil(q·n)-th smallest value) lies within the
    reported [value_lo, value_hi] — the closed-form guarantee the 100 TB
    gating rests on."""
    xs = [((i * 37) % 997) / 997 for i in range(997)]
    state = histogram_state(_vals(spark, xs), "v", 0.0, 1.0, bins=128)
    ordered = sorted(xs)
    for q in (0.0, 0.1, 0.25, 0.5, 0.73, 0.9, 0.99, 1.0):
        row = quantile_bracket(state, q, 0.0, 1.0, bins=128).collect()
        assert len(row) == 1, q
        r = row[0]
        exact = ordered[max(1, math.ceil(q * len(xs))) - 1]
        assert r["value_lo"] <= exact <= r["value_hi"], (q, exact, r)
        target = max(1, math.ceil(q * len(xs)))
        assert r["cum_lo"] < target <= r["cum_hi"]  # rank sandwich
        assert r["total"] == len(xs)


def test_quantile_bracket_edge_cases(spark):
    """Empty state yields zero rows; q outside [0,1] and a degenerate
    domain raise loudly at construction."""
    import pytest

    empty = histogram_state(_vals(spark, []), "v", 0.0, 1.0, bins=8)
    assert quantile_bracket(empty, 0.5, 0.0, 1.0, bins=8).count() == 0
    with pytest.raises(ValueError, match="q must be"):
        quantile_bracket(empty, 1.5, 0.0, 1.0, bins=8)
    with pytest.raises(ValueError, match="domain"):
        histogram_state(_vals(spark, [0.5]), "v", 1.0, 1.0, bins=8)


def test_histogram_state_is_sparse(spark):
    """Empty bins are never materialized: the state row count is bounded
    by min(distinct bins hit, bins)."""
    xs = [0.5] * 1000
    state = histogram_state(_vals(spark, xs), "v", 0.0, 1.0, bins=4096)
    assert state.count() == 1


def test_histogram_plan_is_one_partial_aggregate(spark):
    """Plan pins: the build is project -> hash aggregate, no join; the
    bracket runs over the O(bins) state with a single-row broadcast
    total — no SortMergeJoin, no cartesian on unbounded frames."""
    from flink_stream_processing_spark.plans.inspect import formatted_plan

    xs = [i / 100 for i in range(100)]
    state = histogram_state(_vals(spark, xs), "v", 0.0, 1.0, bins=64)
    build_plan = formatted_plan(state)
    assert "Join" not in build_plan and "HashAggregate" in build_plan
    bracket_plan = formatted_plan(quantile_bracket(state, 0.5, 0.0, 1.0, bins=64))
    assert "SortMergeJoin" not in bracket_plan
    assert "CartesianProduct" not in bracket_plan


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
                min_size=0, max_size=30),
    split=st.integers(0, 30),
    bins=st.sampled_from([1, 2, 16, 64]),
)
def test_histogram_equals_python_model(spark_global, xs, split, bins):
    """Random sweep vs the exact Python model: clamp + floor bucketing,
    sparse packing, and shard-merge at an arbitrary split point."""
    spark = spark_global
    width = 1.0 / bins
    model: dict[int, int] = {}
    for x in xs:
        i = min(bins - 1, max(0, math.floor(x / width)))
        model[i] = model.get(i, 0) + 1
    merged = histogram_merge(
        histogram_state(_vals(spark, xs[:split]), "v", 0.0, 1.0, bins=bins),
        histogram_state(_vals(spark, xs[split:]), "v", 0.0, 1.0, bins=bins),
    )
    assert _state_map(merged) == model


def test_histogram_state_is_streaming_transparent(spark):
    """Stream ≡ batch law: histogram_state over the real documents file
    stream (complete mode) equals the batch state on the same values —
    the curation pipeline can maintain its quality histogram per
    micro-batch with the same function. Mirrors the bloom-probe and
    ivf-assign stream-transparency pins."""
    from flink_stream_processing_spark.operators.text import quality_score
    from flink_stream_processing_spark.queries_impl import web_dedup_stream as _wds
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _run_stream_to_table,
        _stream_session,
        table_stream_dir,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    s = _stream_session(spark)
    batch_q = quality_score(load_table(s, SF_DIR, "documents")).select("quality")
    want = _state_map(histogram_state(batch_q, "quality", 0.0, 1.0, bins=256))

    stream_q = quality_score(
        _wds.documents_file_stream(s, table_stream_dir(SF_DIR, "documents"))
    ).select("quality")
    got = _state_map(
        _run_stream_to_table(
            histogram_state(stream_q, "quality", 0.0, 1.0, bins=256), "complete"
        )
    )
    assert got == want and sum(want.values()) > 0
