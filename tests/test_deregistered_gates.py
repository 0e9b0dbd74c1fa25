"""In-suite gates for rows DEREGISTERED under the post-saturation swap
policy (OPERATORS.md "Registry policy after saturation"): the capability
is retained in full — function, oracle, and plan pin — only its DRIVER
gate moved here. One test pair per deregistered row, forever.

r19: salted_two_phase_agg (swapped for mg_heavy_hitters_topk)."""

from __future__ import annotations

from flink_stream_processing_spark.plans import formatted_plan
from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.queries_impl.analytics_extra import (
    _SALTED_ORACLE,
    q_salted_two_phase_agg,
)

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


def test_salted_two_phase_agg_not_registered():
    """The swap's both halves: the deregistered name is gone from the
    registry and the replacement holds a driver slot."""
    assert "salted_two_phase_agg" not in QUERIES
    assert "mg_heavy_hitters_topk" in QUERIES


def test_salted_two_phase_agg_matches_oracle(spark):
    """The exact gate the driver sweep used to run: salted partial/final
    composition is semantically invisible vs the plain-SQL aggregation."""
    assert_matches_oracle(
        q_salted_two_phase_agg(spark, SF_DIR), _SALTED_ORACLE, SF_DIR
    )


def test_salted_two_phase_agg_no_cartesian(spark):
    """The no-cartesian pin this row held in test_plans' registry-wide
    sweep, preserved verbatim."""
    plan = formatted_plan(q_salted_two_phase_agg(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
