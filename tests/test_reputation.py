"""Gate and laws for the r16-queued source-reputation query (Bayesian-
shrunk per-domain quality). Oracle-gated here through the same
assert_matches_oracle harness the driver mirrors — registration deferred
per the r14 zero-add-slot arithmetic (OPERATORS.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_processing_spark.queries_impl.reputation import (
    _REPUTATION_PRIOR_N,
    SOURCE_REPUTATION_ORACLE,
    q_source_reputation_scores,
    source_reputation,
)
from flink_stream_processing_spark.operators.text import quality_score
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


def test_source_reputation_matches_oracle(spark):
    assert_matches_oracle(
        q_source_reputation_scores(spark, SF_DIR), SOURCE_REPUTATION_ORACLE, SF_DIR
    )


def test_reputation_shrinks_toward_global_mean(spark):
    """The shrinkage laws, checked against exact arithmetic: reputation
    lies BETWEEN the source mean and the global mean (never extrapolates),
    and equals mean + K/(n+K) * (gmean - mean) to rounding — so a
    high-evidence source keeps its own mean and a 1-doc source sits at
    the prior."""
    docs = load_table(spark, SF_DIR, "documents")
    q = quality_score(docs).select("source", "quality")
    gmean = q.agg(F.avg("quality")).first()[0]
    rows = source_reputation(docs).collect()
    assert len(rows) > 1
    for r in rows:
        lo, hi = sorted((r["mean_quality"], gmean))
        assert lo - 1e-6 <= r["reputation"] <= hi + 1e-6, r
        k = _REPUTATION_PRIOR_N
        expected = r["mean_quality"] + k / (r["n_docs"] + k) * (
            gmean - r["mean_quality"]
        )
        assert abs(r["reputation"] - expected) < 1e-5, r


def test_reputation_prior_dominates_small_sources(spark):
    """Synthetic two-source frame: a 1-doc source with an extreme score
    must land near the global mean; a many-doc source must keep (most of)
    its own mean. Pins the direction the pseudo-count is applied in —
    swapping n and K would pass the between-ness law but fail this."""
    base = [(i, "the a of and to in " * 30, "en", "big", 100) for i in range(40)]
    outlier = [(99, "zz", "en", "tiny", 2)]
    docs = spark.createDataFrame(
        base + outlier, "doc_id long, text string, lang string, source string, n_chars long"
    )
    rows = {r["source"]: r for r in source_reputation(docs).collect()}
    big, tiny = rows["big"], rows["tiny"]
    gmean = (
        big["n_docs"] * big["mean_quality"] + tiny["n_docs"] * tiny["mean_quality"]
    ) / (big["n_docs"] + tiny["n_docs"])
    # the tiny source moved almost all the way to the global mean
    assert abs(tiny["reputation"] - gmean) < abs(tiny["mean_quality"] - gmean) * 0.2
    # the big source kept the majority of its own signal
    assert abs(big["reputation"] - big["mean_quality"]) < abs(
        big["mean_quality"] - gmean
    )
