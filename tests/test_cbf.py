"""Laws for the mergeable counting Bloom filter (operators/cbf.py, r19
library capability — no registry entry per the post-saturation policy;
these laws + the hypothesis sweep + the in-suite DuckDB oracle gate ARE
the gate). The state is a plain additive group over deterministic
positions, so every law is exact frame equality — including the delete
law the bitmap family cannot have."""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.bloom import bloom_bits, bloom_probe
from flink_stream_processing_spark.operators.cbf import (
    CBF_FP_ORACLE,
    CBF_ORACLE_K,
    CBF_ORACLE_M,
    cbf_counts,
    cbf_merge,
    cbf_probe,
    cbf_remove,
    cbf_summary,
    cbf_to_bits,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR

_M, _K = 1 << 10, 3  # small space -> real collisions exercise every law


def _keys(spark, keys):
    if not keys:
        return spark.createDataFrame([], "key string")
    return spark.createDataFrame([(k,) for k in keys], "key string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _model_positions(key: str, m: int, k: int) -> list[int]:
    """Exact Python model of the md5-twin position function."""
    import hashlib

    return [
        int(hashlib.md5(f"{key}#{j}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    ]


def _model_counts(keys, m: int, k: int) -> Counter:
    c: Counter = Counter()
    for key in keys:
        c.update(_model_positions(key, m, k))
    return c


def test_merge_is_lossless_and_commutative(spark):
    a = _keys(spark, [f"a{i}" for i in range(80)])
    b = _keys(spark, [f"b{i}" for i in range(70)])
    sa, sb = cbf_counts(a, m=_M, k=_K), cbf_counts(b, m=_M, k=_K)
    union = cbf_counts(a.unionByName(b), m=_M, k=_K)
    assert _rows(cbf_merge(sa, sb)) == _rows(union)
    assert _rows(cbf_merge(sb, sa)) == _rows(union)


def test_remove_is_exact_inverse(spark):
    """THE capability the bitmap lacks: deleting a member key set leaves
    the state counter-identical to a build that never saw it — not just
    probe-equivalent. Small m so removed keys genuinely share positions
    with survivors (the case where clearing bits would corrupt)."""
    keep = [f"a{i}" for i in range(60)]
    gone = [f"b{i}" for i in range(60)]
    full = cbf_counts(_keys(spark, keep + gone), m=_M, k=_K)
    after = cbf_remove(full, _keys(spark, gone), m=_M, k=_K)
    assert _rows(after) == _rows(cbf_counts(_keys(spark, keep), m=_M, k=_K))
    # survivors still probe positive through the shared positions
    pr = cbf_probe(_keys(spark, keep), after, m=_M, k=_K)
    assert pr.filter(~F.col("cbf_positive")).count() == 0


def test_no_false_negatives(spark):
    keys = _keys(spark, [f"k{i}" for i in range(300)])
    state = cbf_counts(keys, m=_M, k=_K)
    assert (
        cbf_probe(keys, state, m=_M, k=_K)
        .filter(~F.col("cbf_positive"))
        .count()
        == 0
    )


def test_bitmap_agreement_with_bloom_family(spark):
    """cbf_to_bits == bloom_bits bit-for-bit over the same key set with
    the same (m, k, xxhash64), and the two probes agree on every verdict
    (members AND planted negatives) — a CBF-maintained screen drops into
    any bitmap consumer without a rebuild."""
    members = _keys(spark, [f"k{i}" for i in range(150)])
    negatives = _keys(spark, [f"x{i}" for i in range(150)])
    state = cbf_counts(members, m=_M, k=_K)
    bits = bloom_bits(members, m=_M, k=_K)
    assert _rows(cbf_to_bits(state)) == _rows(bits)
    probes = members.unionByName(negatives)
    got = _rows(
        cbf_probe(probes, state, m=_M, k=_K).withColumnRenamed(
            "cbf_positive", "p"
        )
    )
    want = _rows(
        bloom_probe(probes, bits, m=_M, k=_K).withColumnRenamed(
            "bloom_positive", "p"
        )
    )
    assert got == want


def test_nonmember_removal_is_observable(spark):
    """The contract-violation observable: membership-closed removal never
    yields a negative counter; removing never-inserted keys does, and
    cbf_summary surfaces it (the span-refcount over-decrement rule)."""
    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    state = cbf_counts(_keys(spark, a), m=_M, k=_K)
    ok = cbf_remove(state, _keys(spark, a[:20]), m=_M, k=_K)
    assert cbf_summary(ok).collect()[0]["n_negative"] == 0
    bad = cbf_remove(state, _keys(spark, b), m=_M, k=_K)
    assert cbf_summary(bad).collect()[0]["n_negative"] > 0


def test_md5_twin_matches_duckdb_oracle(spark):
    """The driver-equivalent gate (post-saturation policy item 1): the
    md5-twin counter state over the documents fingerprint set is
    bit-identical between Spark and DuckDB — positions AND counts."""
    fps = (
        load_table(spark, SF_DIR, "documents")
        .select(F.md5(F.lower(F.trim("text"))).alias("key"))
        .distinct()
    )
    got = [
        (r["pos"], r["n"])
        for r in cbf_counts(
            fps, m=CBF_ORACLE_M, k=CBF_ORACLE_K, hash_fn="md5"
        )
        .orderBy("pos")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = list(map(tuple, con.execute(CBF_FP_ORACLE).df().itertuples(index=False)))
    assert got == want and len(got) > 0


def test_probe_broadcasts_state_never_shuffles_probe_side(spark):
    """Plan pin: the probe joins the broadcast sparse state — a
    SortMergeJoin/ShuffledHashJoin here would shuffle the whole probe
    scan on position at 100 TB."""
    from flink_stream_processing_spark.plans import formatted_plan

    probes = _keys(spark, [f"k{i}" for i in range(50)])
    state = cbf_counts(probes, m=_M, k=_K)
    plan = formatted_plan(cbf_probe(probes, state, m=_M, k=_K))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="#"),
            min_size=0,
            max_size=8,
        ),
        max_size=40,
        unique=True,
    ),
    n_remove=st.integers(min_value=0, max_value=40),
)
def test_cbf_equals_python_model(spark_global, keys, n_remove):
    """Hypothesis sweep vs the exact Counter model (md5 twin so the model
    is engine-independent): build, a membership-closed removal of an
    arbitrary prefix, and the probe verdicts all match the model."""
    spark = spark_global
    m, k = 1 << 8, 3
    removed = keys[: min(n_remove, len(keys))]
    kept = keys[len(removed) :]
    state = cbf_counts(_keys(spark, keys), m=m, k=k, hash_fn="md5")
    after = cbf_remove(state, _keys(spark, removed), m=m, k=k, hash_fn="md5")
    model = _model_counts(kept, m, k)
    assert {(r["pos"], r["n"]) for r in after.collect()} == {
        (p, n) for p, n in model.items() if n != 0
    }
    if kept:
        verdicts = {
            r["key"]: r["cbf_positive"]
            for r in cbf_probe(
                _keys(spark, kept), after, m=m, k=k, hash_fn="md5"
            ).collect()
        }
        model_pos = {p for p, n in model.items() if n > 0}
        for key in kept:
            want = all(p in model_pos for p in _model_positions(key, m, k))
            assert verdicts[key] == want, key
