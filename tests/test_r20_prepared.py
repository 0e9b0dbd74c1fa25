"""Driver-equivalent gates for the PREPARED r20 registration cohort
(queries_impl/r20_prepared.py — NOT imported by queries.py; these
assert_matches_oracle drives are the gate until the r20 flip). One test
per planned row, at the driver's compare SF, plus the not-registered
pin that keeps the module prepared-only until the flip commit."""

from __future__ import annotations

from flink_stream_processing_spark.operators.cbf import CBF_FP_ORACLE
from flink_stream_processing_spark.operators.cms import CMS_TOKENS_ORACLE
from flink_stream_processing_spark.operators.lm import LM_PPL_ORACLE
from flink_stream_processing_spark.operators.pmi import PMI_ORACLE
from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.queries_impl.r20_prepared import (
    CORPUS_OVERLAP_BOUNDS_ORACLE,
    q_cbf_fp_cells,
    q_cms_token_cells,
    q_corpus_overlap_bounds,
    q_lm_ppl_scores,
    q_pmi_collocations,
)

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle

_PLANNED = {
    "lm_ppl_scores",
    "pmi_collocations",
    "cbf_fp_cells",
    "cms_token_cells",
    "corpus_overlap_bounds",
}


def test_cohort_is_prepared_not_registered():
    """Until the r20 flip none of the planned names may hold a registry
    slot (the prepared-add contract); this test INVERTS at flip time."""
    assert not (_PLANNED & set(QUERIES)), _PLANNED & set(QUERIES)


def test_lm_ppl_scores_matches_oracle(spark):
    assert_matches_oracle(q_lm_ppl_scores(spark, SF_DIR), LM_PPL_ORACLE, SF_DIR)


def test_pmi_collocations_matches_oracle(spark):
    assert_matches_oracle(q_pmi_collocations(spark, SF_DIR), PMI_ORACLE, SF_DIR)


def test_cbf_fp_cells_matches_oracle(spark):
    assert_matches_oracle(q_cbf_fp_cells(spark, SF_DIR), CBF_FP_ORACLE, SF_DIR)


def test_cms_token_cells_matches_oracle(spark):
    assert_matches_oracle(
        q_cms_token_cells(spark, SF_DIR), CMS_TOKENS_ORACLE, SF_DIR
    )


def test_corpus_overlap_bounds_matches_oracle(spark):
    assert_matches_oracle(
        q_corpus_overlap_bounds(spark, SF_DIR),
        CORPUS_OVERLAP_BOUNDS_ORACLE,
        SF_DIR,
    )


def test_prepared_cohort_plan_pre_pins(spark):
    """The r15 prepared-cohort convention: no CartesianProduct anywhere,
    and BNLJ only for the documented scalar ride-ins (LM's V row, PMI's
    totals, the overlap report's single-row composition) — a plan
    regression fails here before the registration round."""
    import re

    from flink_stream_processing_spark.plans import formatted_plan

    budgets = {
        q_lm_ppl_scores: 1,  # the V ride-in
        q_pmi_collocations: 2,  # totals build + ride-in
        q_cbf_fp_cells: 0,
        q_cms_token_cells: 0,
        # three exact scalars + the report's own a×b×union composition
        # — every one a single-row broadcast
        q_corpus_overlap_bounds: 5,
    }
    for fn, bnlj_budget in budgets.items():
        plan = formatted_plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, (fn.__name__, plan)
        bnlj = set(re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
        assert len(bnlj) <= bnlj_budget, (fn.__name__, len(bnlj), plan)
