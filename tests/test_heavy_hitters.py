"""Laws for the mergeable Misra–Gries heavy-hitters summary
(operators/heavy_hitters.py, r18 library capability — no registry entry
per the post-saturation policy; these laws + the hypothesis sweep + the
in-suite DuckDB oracle gate ARE the gate). The offset-prune form is
deterministic, so every law is exact — the sandwich/certificate bounds
are closed-form inequalities on integers, and merge commutativity is
bit-identical frame equality."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.heavy_hitters import (
    MG_TOKENS_K,
    MG_TOKENS_ORACLE,
    MGState,
    mg_build,
    mg_heavy_hitters,
    mg_merge,
)
from flink_stream_processing_spark.operators.text import tokens_col
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


def _fixture_tokens(spark):
    return load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens_col()).alias("key")
    )


def _keys(spark, keys):
    if not keys:
        return spark.createDataFrame([], "key string")
    return spark.createDataFrame([(k,) for k in keys], "key string")


def _read(state: MGState):
    counters = {r["key"]: r["est"] for r in state.counters.collect()}
    meta = state.meta.collect()[0]
    return counters, meta["n_total"], meta["err_bound"]


def _assert_mg_laws(counters, n_total, err_bound, exact: Counter, k: int):
    """The full guarantee set vs exact counts: sandwich for counter keys,
    absent-key bound, certificate vs N/(k+1), bounded state, and exact
    total mass."""
    assert len(counters) <= k
    assert n_total == sum(exact.values())
    assert 0 <= err_bound <= n_total / (k + 1)
    for key, est in counters.items():
        assert 0 <= exact[key] - est <= err_bound, (key, est, exact[key])
    for key, true in exact.items():
        if key not in counters:
            assert true <= err_bound, (key, true, err_bound)


def test_mg_tokens_match_duckdb_oracle(spark):
    """The driver-equivalent gate (post-saturation policy item 1): the
    deterministic offset-prune summary of the documents token stream is
    bit-identical between Spark and DuckDB — counters AND estimates."""
    sdf = mg_build(_fixture_tokens(spark), k=MG_TOKENS_K).counters.orderBy(
        F.desc("est"), "key"
    )
    assert_matches_oracle(sdf, MG_TOKENS_ORACLE, SF_DIR)


def test_mg_build_and_shard_merge_guarantees_on_fixture(spark):
    """Sandwich + certificate + bounded state on real text, for the
    single-pass build AND a 2-shard merge over a disjoint key split (the
    pmod split — Java % would leave negative hashes in neither shard)."""
    toks = _fixture_tokens(spark)
    exact = Counter(
        {r["key"]: r["n"] for r in toks.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).collect()}
    )
    k = 16
    _assert_mg_laws(*_read(mg_build(toks, k=k)), exact, k)
    a = mg_build(toks.filter(F.pmod(F.xxhash64("key"), F.lit(2)) == 0), k=k)
    b = mg_build(toks.filter(F.pmod(F.xxhash64("key"), F.lit(2)) == 1), k=k)
    _assert_mg_laws(*_read(mg_merge(a, b, k=k)), exact, k)


def test_mg_lossless_when_under_k_distinct(spark):
    """≤ k distinct keys => the summary IS the exact count table
    (err_bound 0), and merging lossless summaries stays lossless while
    the union stays ≤ k — the small-case degeneracy a user relies on."""
    k = 8
    a_keys = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    b_keys = ["b"] * 2 + ["d"] * 4
    a = mg_build(_keys(spark, a_keys), k=k)
    ca, na, ea = _read(a)
    assert ca == {"a": 5, "b": 3, "c": 1} and (na, ea) == (9, 0)
    m = mg_merge(a, mg_build(_keys(spark, b_keys), k=k), k=k)
    cm, nm, em = _read(m)
    assert cm == {"a": 5, "b": 5, "c": 1, "d": 4} and (nm, em) == (15, 0)


def test_mg_merge_commutes_bit_identically(spark):
    """merge(a, b) == merge(b, a) as frames — the offset prune depends
    only on the count multiset, so there is no tie-break asymmetry."""
    a = mg_build(_keys(spark, [f"k{i % 7}" for i in range(40)]), k=4)
    b = mg_build(_keys(spark, [f"k{i % 11}" for i in range(30)]), k=4)
    ab, ba = mg_merge(a, b, k=4), mg_merge(b, a, k=4)
    assert ab.counters.exceptAll(ba.counters).count() == 0
    assert ba.counters.exceptAll(ab.counters).count() == 0
    assert ab.meta.collect() == ba.meta.collect()


def test_mg_phi_completeness_on_planted_zipf(spark):
    """φ-completeness on a planted skew: every key with true > φ·N is in
    mg_heavy_hitters — the no-false-negative certificate. Planted: three
    hot keys at 30/20/10 % of the stream over a uniform 1000-key tail,
    k = 16, φ = 1/(k+1)."""
    n_tail = 4_000
    hot = ["hot_a"] * 3_000 + ["hot_b"] * 2_000 + ["hot_c"] * 1_000
    tail = [f"t{i % 1_000}" for i in range(n_tail)]
    items = _keys(spark, hot + tail)
    k = 16
    state = mg_build(items, k=k)
    counters, n_total, err_bound = _read(state)
    exact = Counter(hot + tail)
    _assert_mg_laws(counters, n_total, err_bound, exact, k)
    phi = 1.0 / (k + 1)
    got = {r["key"] for r in mg_heavy_hitters(state, phi).collect()}
    want = {key for key, n in exact.items() if n > phi * len(hot + tail)}
    assert want == {"hot_a", "hot_b", "hot_c"}
    assert want <= got


def test_mg_prune_is_topk_heap_not_global_sort(spark):
    """Plan pin: the (k+1)-th-largest lookup is TakeOrderedAndProject
    (per-partition heaps) — a global Sort over the count table would be
    the 100 TB scale-killer the offset form exists to avoid."""
    from flink_stream_processing_spark.plans.inspect import formatted_plan

    state = mg_build(_keys(spark, [f"k{i % 9}" for i in range(50)]), k=4)
    plan = formatted_plan(state.counters)
    assert "TakeOrderedAndProject" in plan
    assert "\n   Sort " not in plan


# --- hypothesis sweep: build + merge vs exact Python counts -----------------

_KEY = st.integers(min_value=0, max_value=12).map(lambda i: f"x{i}")
_KEYS = st.lists(_KEY, min_size=0, max_size=30)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_KEYS, right=_KEYS, k=st.integers(min_value=1, max_value=6))
def test_mg_equals_count_model(spark_global, left, right, k):
    """Random sweep: every guarantee holds for the build over each side,
    the merged summary over the union, AND the self-merge (idempotent
    mass: merge(s, s) summarizes the doubled stream)."""
    spark = spark_global
    a, b = mg_build(_keys(spark, left), k=k), mg_build(_keys(spark, right), k=k)
    _assert_mg_laws(*_read(a), Counter(left), k)
    _assert_mg_laws(*_read(b), Counter(right), k)
    _assert_mg_laws(*_read(mg_merge(a, b, k=k)), Counter(left + right), k)
    _assert_mg_laws(*_read(mg_merge(a, a, k=k)), Counter(left + left), k)


def test_mg_foreachbatch_refresh_equals_batch(spark, tmp_path):
    """Stream ≡ batch (the mergeable-store family pin, fifth member):
    folding mg_merge over the micro-batches of a real file stream keeps
    every guarantee vs the batch-exact counts, and with k above the
    distinct-key count the folded summary is BIT-EQUAL to the one-shot
    batch summary (both lossless). 4 forced micro-batches."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.explode(tokens_col()).alias("key")
    )
    src = str(tmp_path / "mg_stream")
    docs.repartition(4).write.parquet(src)

    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    s = _stream_session(spark)
    stream = s.readStream.schema("doc_id long, key string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    k = 16
    state = {"mg": None}

    def refresh(batch_df, _batch_id):
        fresh = mg_build(batch_df.select("key"), k=k)
        if state["mg"] is not None:
            held_c, held_m = state["mg"]
            ss = batch_df.sparkSession
            fresh = mg_merge(
                MGState(
                    ss.createDataFrame(held_c, "key string, est long"),
                    ss.createDataFrame(held_m, "n_total long, err_bound long"),
                ),
                fresh,
                k=k,
            )
        state["mg"] = (
            [(r["key"], r["est"]) for r in fresh.counters.collect()],
            [tuple(r) for r in fresh.meta.collect()],
        )

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2

    counters = dict(state["mg"][0])
    n_total, err_bound = state["mg"][1][0]
    exact = Counter(
        {r["key"]: r["n"] for r in docs.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).collect()}
    )
    _assert_mg_laws(counters, n_total, err_bound, exact, k)

    # lossless twin: k above the distinct count => folded == batch, bit-equal
    k_big = len(exact) + 10
    state["mg"] = None

    def refresh_big(batch_df, _batch_id):
        fresh = mg_build(batch_df.select("key"), k=k_big)
        if state["mg"] is not None:
            held_c, held_m = state["mg"]
            ss = batch_df.sparkSession
            fresh = mg_merge(
                MGState(
                    ss.createDataFrame(held_c, "key string, est long"),
                    ss.createDataFrame(held_m, "n_total long, err_bound long"),
                ),
                fresh,
                k=k_big,
            )
        state["mg"] = (
            [(r["key"], r["est"]) for r in fresh.counters.collect()],
            [tuple(r) for r in fresh.meta.collect()],
        )

    q2 = stream.writeStream.foreachBatch(refresh_big).trigger(
        availableNow=True
    ).start()
    assert q2.awaitTermination(300)
    assert dict(state["mg"][0]) == dict(exact)
    assert state["mg"][1][0] == (sum(exact.values()), 0)


def test_mg_weighted_guarantees_and_merge(spark):
    """The weighted form (bytes-per-host shape): guarantees hold with
    N = total weight — sandwich vs exact weighted sums, certificate,
    φ-completeness for the planted heavy host — for the build AND a
    2-shard merge, and the unweighted form is the weight≡1 special case
    (bit-identical states)."""
    rows = (
        [("big.example", 500) for _ in range(10)]
        + [(f"t{i}.example", 7) for i in range(200)]
        + [("mid.example", 90) for _ in range(8)]
    )
    items = spark.createDataFrame(rows, "host string, nbytes long")
    exact = Counter()
    for h, w in rows:
        exact[h] += w
    k = 8
    state = mg_build(items, key_col="host", k=k, weight_col="nbytes")
    counters = {r["host"]: r["est"] for r in state.counters.collect()}
    meta = state.meta.collect()[0]
    _assert_mg_laws(counters, meta["n_total"], meta["err_bound"], exact, k)
    phi = 1.0 / (k + 1)
    hh = {r["host"] for r in mg_heavy_hitters(state, phi, key_col="host").collect()}
    want = {h for h, n in exact.items() if n > phi * sum(exact.values())}
    assert "big.example" in want and want <= hh

    a = mg_build(
        items.filter(F.pmod(F.xxhash64("host"), F.lit(2)) == 0),
        key_col="host",
        k=k,
        weight_col="nbytes",
    )
    b = mg_build(
        items.filter(F.pmod(F.xxhash64("host"), F.lit(2)) == 1),
        key_col="host",
        k=k,
        weight_col="nbytes",
    )
    m = mg_merge(a, b, key_col="host", k=k)
    mc = {r["host"]: r["est"] for r in m.counters.collect()}
    mm = m.meta.collect()[0]
    _assert_mg_laws(mc, mm["n_total"], mm["err_bound"], exact, k)

    # weight ≡ 1 degenerates to the unweighted build, bit-identically
    ones = spark.createDataFrame(
        [(h,) for h, w in rows for _ in range(1)], "host string"
    ).withColumn("one", F.lit(1).cast("long"))
    uw = mg_build(ones, key_col="host", k=k)
    ww = mg_build(ones, key_col="host", k=k, weight_col="one")
    assert uw.counters.exceptAll(ww.counters).count() == 0
    assert ww.counters.exceptAll(uw.counters).count() == 0
    assert uw.meta.collect() == ww.meta.collect()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(_KEY, st.integers(min_value=1, max_value=50)),
        min_size=0,
        max_size=15,
    ),
    right=st.lists(
        st.tuples(_KEY, st.integers(min_value=1, max_value=50)),
        min_size=0,
        max_size=15,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_mg_weighted_equals_sum_model(spark_global, left, right, k):
    """Weighted random sweep: guarantees vs exact weight sums for each
    side's build and the merged union — N = total weight throughout."""
    spark = spark_global

    def frame(rows):
        if not rows:
            return spark.createDataFrame([], "key string, w long")
        return spark.createDataFrame(rows, "key string, w long")

    def model(rows):
        c = Counter()
        for key, w in rows:
            c[key] += w
        return c

    a = mg_build(frame(left), k=k, weight_col="w")
    b = mg_build(frame(right), k=k, weight_col="w")
    _assert_mg_laws(*_read(a), model(left), k)
    _assert_mg_laws(*_read(b), model(right), k)
    _assert_mg_laws(*_read(mg_merge(a, b, k=k)), model(left + right), k)
