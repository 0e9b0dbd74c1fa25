"""Laws for the turnstile Count-Min store (operators/cms.py, r19 library
capability — no registry entry per the post-saturation policy; these
laws + the hypothesis sweep + the in-suite DuckDB oracle gate ARE the
gate). Cells are exact integer sums, so merge/inverse laws are frame
equality and the never-underestimate guarantee is checked against exact
counts, not a probabilistic bound."""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.cms import (
    CMS_ORACLE_D,
    CMS_ORACLE_W,
    CMS_TOKENS_ORACLE,
    cms_counts,
    cms_merge,
    cms_query,
    cms_remove,
    cms_summary,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR

_W, _D = 1 << 10, 3  # small width -> real collisions exercise the min


def _keys(spark, keys):
    if not keys:
        return spark.createDataFrame([], "key string")
    return spark.createDataFrame([(k,) for k in keys], "key string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_is_lossless_and_commutative(spark):
    a = _keys(spark, [f"k{i % 30}" for i in range(200)])
    b = _keys(spark, [f"k{(i + 7) % 45}" for i in range(150)])
    whole = cms_counts(a.unionByName(b), w=_W, d=_D)
    sa, sb = cms_counts(a, w=_W, d=_D), cms_counts(b, w=_W, d=_D)
    assert _rows(cms_merge(sa, sb)) == _rows(whole)
    assert _rows(cms_merge(sb, sa)) == _rows(whole)


def test_remove_is_exact_inverse_and_estimates_stay_sound(spark):
    """Turnstile delete = cell-identical inverse, and the CMS guarantee
    (never underestimate) holds on the surviving multiset."""
    a_keys = [f"k{i % 30}" for i in range(300)]
    b_keys = [f"k{(i + 11) % 30}" for i in range(200)]
    a, b = _keys(spark, a_keys), _keys(spark, b_keys)
    whole = cms_counts(a.unionByName(b), w=_W, d=_D)
    after = cms_remove(whole, b, w=_W, d=_D)
    assert _rows(after) == _rows(cms_counts(a, w=_W, d=_D))
    true = Counter(a_keys)
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_query(a.distinct(), after, w=_W, d=_D).collect()
    }
    assert all(est[k] >= c for k, c in true.items())
    assert cms_summary(after).collect()[0]["n_negative"] == 0


def test_never_underestimates_under_collisions(spark):
    """At a deliberately tiny width every key shares cells — the min
    over d rows must still never dip below the true count (the law the
    min aggregation exists for)."""
    keys = [f"k{i % 100}" for i in range(1000)]
    df = _keys(spark, keys)
    state = cms_counts(df, w=64, d=_D)
    true = Counter(keys)
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_query(df.distinct(), state, w=64, d=_D).collect()
    }
    assert all(est[k] >= c for k, c in true.items())


def test_weighted_updates_sum_exactly(spark):
    rows = [("a", 5), ("a", 7), ("b", 3)]
    df = spark.createDataFrame(rows, "key string, wt long")
    state = cms_counts(df, weight_col="wt", w=_W, d=_D)
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_query(
            _keys(spark, ["a", "b"]), state, w=_W, d=_D
        ).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 3
    assert cms_summary(state).collect()[0]["n_total"] == 15 * _D


def test_nonmember_removal_is_observable(spark):
    state = cms_counts(_keys(spark, ["x"] * 10), w=_W, d=_D)
    bad = cms_remove(state, _keys(spark, ["never-seen"] * 5), w=_W, d=_D)
    assert cms_summary(bad).collect()[0]["n_negative"] > 0


def test_md5_twin_matches_duckdb_oracle(spark):
    toks = load_table(spark, SF_DIR, "documents").select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("key")
    )
    got = _rows(
        cms_counts(toks, w=CMS_ORACLE_W, d=CMS_ORACLE_D, hash_fn="md5")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(CMS_TOKENS_ORACLE).df().itertuples(index=False))
    )
    assert got == want and len(got) > 0


def test_query_plan_broadcasts_state(spark):
    from flink_stream_processing_spark.plans import formatted_plan

    probes = _keys(spark, [f"k{i}" for i in range(50)])
    state = cms_counts(probes, w=_W, d=_D)
    assert "Join" not in formatted_plan(state)
    plan = formatted_plan(cms_query(probes, state, w=_W, d=_D))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    inserts=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=40
    ),
    n_remove=st.integers(min_value=0, max_value=40),
)
def test_cms_equals_python_model(spark_global, inserts, n_remove):
    """Hypothesis sweep vs the exact cell model (md5 twin): build,
    remove a membership-closed prefix, cells and every query match the
    model exactly."""
    import hashlib

    spark = spark_global
    w, d = 1 << 8, 3
    removed = inserts[: min(n_remove, len(inserts))]
    kept = inserts[len(removed) :]

    def model_cells(keys):
        c: Counter = Counter()
        for key in keys:
            for j in range(d):
                b = (
                    int(hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:8], 16)
                    % w
                )
                c[(j, b)] += 1
        return c

    state = cms_remove(
        cms_counts(_keys(spark, inserts), w=w, d=d, hash_fn="md5"),
        _keys(spark, removed),
        w=w,
        d=d,
        hash_fn="md5",
    )
    model = model_cells(kept)
    assert {(r["j"], r["bucket"], r["c"]) for r in state.collect()} == {
        (j, b, n) for (j, b), n in model.items() if n != 0
    }
    if kept:
        est = {
            r["key"]: r["cms_estimate"]
            for r in cms_query(
                _keys(spark, sorted(set(kept))), state, w=w, d=d, hash_fn="md5"
            ).collect()
        }
        for key in set(kept):
            want = min(
                model[
                    (
                        j,
                        int(
                            hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:8],
                            16,
                        )
                        % w,
                    )
                ]
                for j in range(d)
            )
            assert est[key] == want, key


def test_cms_state_is_streaming_transparent_with_takedowns(spark, tmp_path):
    """Stream ≡ batch for the turnstile store WITH a mid-stream delete:
    folding cms_merge over micro-batches and applying a takedown
    decrement lands cell-identical on the batch build over survivors."""
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    items = spark.range(2_000).select(
        F.col("id"),
        F.concat(F.lit("k"), F.pmod(F.col("id"), F.lit(50)).cast("string")).alias(
            "key"
        ),
    )
    removed = items.filter(F.col("id") % 4 == 0).select("key")
    kept = items.filter(F.col("id") % 4 != 0).select("key")
    src = str(tmp_path / "cms_stream")
    items.select("id", "key").repartition(3).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("id long, key string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state: dict = {"cells": None, "takedown_done": False}

    def refresh(batch_df, _batch_id):
        delta = cms_counts(batch_df.select("key"), w=_W, d=_D).localCheckpoint(
            eager=True
        )
        merged = (
            delta
            if state["cells"] is None
            else cms_merge(state["cells"], delta).localCheckpoint(eager=True)
        )
        if not state["takedown_done"]:
            merged = cms_remove(merged, removed, w=_W, d=_D).localCheckpoint(
                eager=True
            )
            state["takedown_done"] = True
        state["cells"] = merged

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    assert state["takedown_done"]

    # NOTE the takedown ran against the FIRST micro-batch's partial state,
    # decrementing keys later batches re-inserted — legal in the turnstile
    # group (cells are order-free sums), so the fold still equals
    # batch-over-survivors exactly
    assert _rows(state["cells"]) == _rows(cms_counts(kept, w=_W, d=_D))
