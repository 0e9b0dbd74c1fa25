"""Laws for the mergeable Bloom-filter state (operators/bloom.py, r17
library capability — no registry entry per the post-saturation policy;
these laws plus the hypothesis sweep and the opt-in scale rung ARE the
gate).

The merge law here is the sketch family's strongest form — LOSSLESS and
bit-identical (like the HLL register-max), so it is pinned with exact
frame equality, not a tolerance. The no-false-negative law is the Bloom
guarantee itself and is also exact. Only the false-positive RATE is
probabilistic; it gets a generous ceiling against the closed-form
(1 - e^{-kn/m})^k estimate on planted disjoint negatives (deterministic
given the fixed xxhash64 positions, so the measured value is stable)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.bloom import (
    _BLOOM_K,
    _BLOOM_M,
    bloom_bits,
    bloom_merge,
    bloom_popcount,
    bloom_probe,
)


def _keys(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.concat(F.lit(f"{prefix}-"), F.col("id")).alias("key")
    )


def _words(state) -> dict[int, int]:
    return {r["word_idx"]: r["word"] for r in state.collect()}


def test_bloom_sharded_merge_is_lossless(spark):
    """bits(A ∪ B) == merge(bits(A), bits(B)) — bit-identical. Shards
    build independently; the store is never re-scanned."""
    members = _keys(spark, "key", 5_000)
    single = _words(bloom_bits(members))
    a = bloom_bits(members.filter(F.col("key").substr(-1, 1).isin("0", "2", "4", "6", "8")))
    b = bloom_bits(members.filter(F.col("key").substr(-1, 1).isin("1", "3", "5", "7", "9")))
    assert _words(bloom_merge(a, b)) == single


def test_bloom_no_false_negatives(spark):
    """Every inserted key probes positive — the Bloom guarantee, exact.
    Duplicated probe keys still get one verdict row each distinct key,
    and a key whose k hashes collide onto fewer than k distinct bits
    must still verdict positive (the boolean-AND aggregation, not a
    hit-count-vs-k compare)."""
    members = _keys(spark, "key", 5_000)
    state = bloom_bits(members)
    verdicts = bloom_probe(members.unionByName(members), state)
    assert verdicts.count() == 5_000
    assert verdicts.filter(~F.col("bloom_positive")).count() == 0


def test_bloom_fpr_within_closed_form_envelope(spark):
    """Planted disjoint negatives false-positive within 3x the
    asymptotic (1 - e^{-kn/m})^k + 1% — generous because the estimate is
    asymptotic, tight enough that a broken hash (all keys to one bucket:
    FPR -> ~0 or ~1) or a stuck-bits bug fails loudly."""
    n = 5_000
    state = bloom_bits(_keys(spark, "key", n))
    fp = bloom_probe(_keys(spark, "neg", n), state).filter(
        F.col("bloom_positive")
    ).count()
    bound = (1 - math.exp(-_BLOOM_K * n / _BLOOM_M)) ** _BLOOM_K
    assert fp / n <= 3 * bound + 0.01, (fp / n, bound)
    assert fp > 0  # a 0 FPR at this fill ratio would mean probes are broken


def test_bloom_merge_idempotent_commutative_monotone(spark):
    """merge(s, s) == s; merge(a, b) == merge(b, a); and a merge never
    clears a bit (popcount non-decreasing vs both inputs)."""
    a = bloom_bits(_keys(spark, "key", 2_000))
    b = bloom_bits(_keys(spark, "other", 2_000))
    wa, wb = _words(a), _words(b)
    assert _words(bloom_merge(a, a)) == wa
    merged = _words(bloom_merge(a, b))
    assert _words(bloom_merge(b, a)) == merged
    for widx, w in wa.items():
        assert merged[widx] & w == w  # every a-bit survives
    for widx, w in wb.items():
        assert merged[widx] & w == w
    pc = {
        name: s.collect()[0]["n_set_bits"]
        for name, s in (("a", bloom_popcount(a)), ("m", bloom_popcount(bloom_merge(a, b))))
    }
    assert pc["m"] >= pc["a"]


def test_bloom_state_is_sparse_and_bounded(spark):
    """The state never exceeds min(k·n, m/64) rows — the sparse
    representation's contract (all-zero words are never materialized)."""
    n = 100
    state = bloom_bits(_keys(spark, "key", n))
    rows = state.count()
    assert rows <= min(_BLOOM_K * n, _BLOOM_M // 64)
    assert state.filter(F.col("word") == 0).count() == 0


def test_bloom_build_plan_is_one_partial_aggregate(spark):
    """Plan pins: the build is explode -> project -> hash aggregate
    (partial map-side then final on word_idx) — no join anywhere; the
    probe side's only join is the BROADCAST of the O(m/64) state (never
    a SortMergeJoin: the probe scan must not shuffle on key)."""
    from flink_stream_processing_spark.plans.inspect import formatted_plan

    members = _keys(spark, "key", 1_000)
    build_plan = formatted_plan(bloom_bits(members))
    assert "Join" not in build_plan
    assert "HashAggregate" in build_plan
    probe_plan = formatted_plan(bloom_probe(members, bloom_bits(members)))
    assert "BroadcastHashJoin" in probe_plan
    assert "SortMergeJoin" not in probe_plan
    assert "CartesianProduct" not in probe_plan


# --- hypothesis sweep: packing equals an exact Python word model ------------

# The hash is shared between build and model (positions are read back
# through ONE Spark query), so this sweeps the packing/OR/grouping logic
# against an independent reimplementation: word_idx = pos // 64,
# word = OR of 1 << (pos % 64), absent words never emitted.


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=50).map(lambda i: f"k{i}"),
        min_size=0,
        max_size=20,
    )
)
def test_bloom_packing_equals_word_model(spark_global, keys):
    spark = spark_global
    frame = spark.createDataFrame([(k,) for k in keys] or [("sentinel",)], "key string")
    if not keys:
        frame = frame.filter(F.lit(False))
    positions = frame.select(
        F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j"), "key"
    ).select(F.pmod(F.xxhash64("key", "j"), F.lit(_BLOOM_M)).alias("pos"))
    model: dict[int, int] = {}
    for r in positions.collect():
        model[r["pos"] // 64] = model.get(r["pos"] // 64, 0) | (1 << (r["pos"] % 64))
    # pack to signed 64-bit (Spark longs are signed; bit 63 wraps negative)
    signed = {
        w: v - (1 << 64) if v >= (1 << 63) else v for w, v in model.items()
    }
    got = {r["word_idx"]: r["word"] for r in bloom_bits(frame).collect()}
    assert got == signed


def test_bloom_probe_is_streaming_transparent(spark):
    """Stream ≡ batch law: bloom_probe applied to the REAL file-stream
    ingest path (stream-static broadcast join + complete-mode aggregate)
    yields exactly the batch verdicts on the same keys — the admission
    pre-filter a daily pipeline runs per micro-batch needs no separate
    streaming implementation. Mirrors the streaming_ivf_assign pattern:
    one function, two execution modes, pinned equal."""
    from flink_stream_processing_spark.queries_impl import web_dedup_stream as _wds
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _run_stream_to_table,
        _stream_session,
        table_stream_dir,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    from .conftest import SF_DIR

    s = _stream_session(spark)
    docs = load_table(s, SF_DIR, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text")))).alias("key")
    state = bloom_bits(
        docs.filter(F.col("doc_id") % 10 != 0).select(fp)
    ).localCheckpoint(eager=True)

    # probe the novel batch slice AND a slice of known members (%10 == 1,
    # inside the corpus), so the law is exercised on BOTH verdicts
    probe_filter = (F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 10 == 1)
    batch_verdicts = bloom_probe(docs.filter(probe_filter).select(fp), state)
    stream = (
        _wds.documents_file_stream(s, table_stream_dir(SF_DIR, "documents"))
        .filter(probe_filter)
        .select(fp)
    )
    streamed_verdicts = _run_stream_to_table(bloom_probe(stream, state), "complete")

    got = sorted(map(tuple, streamed_verdicts.collect()))
    want = sorted(map(tuple, batch_verdicts.collect()))
    assert got == want and len(want) > 0
    assert {v for _, v in want} == {True, False}
