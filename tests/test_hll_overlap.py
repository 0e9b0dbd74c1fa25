"""Laws for the HLL overlap estimator (operators/hll_overlap.py, r19
library capability — no registry entry per the post-saturation policy;
these laws + the hypothesis sweep ARE the gate, with the bound-checked
exact-SQL comparison playing the oracle role — the
`approx_distinct_bounds` pattern, since no cross-engine sketch is
bit-compatible). The error budget is part of the API: every assertion
checks the TRUE value against the reported `err_budget`, never a magic
tolerance."""

from __future__ import annotations

from functools import reduce

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.hll_overlap import (
    hll_overlap_report,
    hll_side_sketch,
    hll_sketch_union,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def _range_keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def _report(spark, a, b):
    return hll_overlap_report(hll_side_sketch(a), hll_side_sketch(b)).collect()[
        0
    ]


def test_fixture_overlap_within_budget_vs_exact_sql(spark):
    """The oracle-role gate: corpus-overlap of two document slices'
    fingerprint sets, exact intersection recomputed by DuckDB, estimate
    within the reported budget."""
    docs = load_table(spark, SF_DIR, "documents")
    fp = F.md5(F.lower(F.trim("text"))).alias("key")
    a = docs.filter(F.col("doc_id") % 3 != 0).select(fp)
    b = docs.filter(F.col("doc_id") % 3 != 1).select(fp)
    rep = _report(spark, a, b)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    exact = con.execute(
        """
        SELECT count(*) FROM (
          SELECT DISTINCT md5(lower(trim(text))) AS k FROM documents
          WHERE doc_id % 3 <> 0
          INTERSECT
          SELECT DISTINCT md5(lower(trim(text))) FROM documents
          WHERE doc_id % 3 <> 1
        )
        """
    ).fetchone()[0]
    assert abs(rep["est_intersection"] - exact) <= rep["err_budget"], (
        rep.asDict(),
        exact,
    )


def test_anchors_disjoint_identical_and_symmetry(spark):
    a = _range_keys(spark, 0, 30_000)
    b = _range_keys(spark, 0, 30_000)
    c = _range_keys(spark, 0, 30_000, prefix="z")
    same = _report(spark, a, b)
    assert same["est_intersection"] == same["est_a"]
    assert same["containment_b_in_a"] == 1.0 and same["jaccard"] == 1.0
    disj = _report(spark, a, c)
    assert disj["est_intersection"] <= disj["err_budget"]
    ab = _report(spark, a, c)
    ba = _report(spark, c, a)
    assert ab["est_intersection"] == ba["est_intersection"]
    assert ab["est_union"] == ba["est_union"]


def test_sharded_sketches_report_identically(spark):
    """HLL union is lossless at equal lg_k: per-shard sketches folded
    with hll_union_agg produce the IDENTICAL report to a single-pass
    side sketch — the maintenance story that lets both corpora grow
    incrementally."""
    a = _range_keys(spark, 0, 50_000)
    b = _range_keys(spark, 30_000, 70_000)
    whole = _report(spark, a, b)
    shards = [
        hll_side_sketch(a.filter(F.pmod(F.xxhash64("key"), F.lit(4)) == s))
        for s in range(4)
    ]
    folded = hll_sketch_union(reduce(lambda x, y: x.unionByName(y), shards))
    rep = hll_overlap_report(folded, hll_side_sketch(b)).collect()[0]
    assert rep.asDict() == whole.asDict()


def test_empty_sides_report_zero_not_divide_by_zero(spark):
    empty = _range_keys(spark, 0, 0)
    a = _range_keys(spark, 0, 1_000)
    rep = _report(spark, a, empty)
    assert rep["est_b"] == 0 and rep["est_intersection"] == 0
    assert rep["containment_b_in_a"] == 0.0
    both = _report(spark, empty, empty)
    assert both["jaccard"] == 0.0 and both["est_union"] == 0


def test_report_plan_is_scalar_composition(spark):
    """The report never touches the key sets: three single-row
    aggregates composed by scalar broadcast crossJoins — no SMJ, no
    cartesian, no join of the key frames."""
    from flink_stream_processing_spark.plans import formatted_plan

    a = _range_keys(spark, 0, 5_000)
    b = _range_keys(spark, 0, 5_000, prefix="z")
    plan = formatted_plan(
        hll_overlap_report(hll_side_sketch(a), hll_side_sketch(b))
    )
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_a=st.integers(min_value=1_000, max_value=20_000),
    n_b=st.integers(min_value=1_000, max_value=20_000),
    overlap_pct=st.integers(min_value=0, max_value=100),
)
def test_overlap_estimate_within_budget(spark_global, n_a, n_b, overlap_pct):
    """Hypothesis sweep over set sizes and overlap fractions: the true
    intersection always lies within the reported error budget, and the
    clamp keeps the estimate feasible."""
    spark = spark_global
    n_shared = min(n_a, n_b) * overlap_pct // 100
    a = _range_keys(spark, 0, n_a)
    b = _range_keys(spark, n_a - n_shared, n_a - n_shared + n_b)
    rep = _report(spark, a, b)
    assert abs(rep["est_intersection"] - n_shared) <= rep["err_budget"], (
        rep.asDict(),
        n_shared,
    )
    assert 0 <= rep["est_intersection"] <= min(rep["est_a"], rep["est_b"])
