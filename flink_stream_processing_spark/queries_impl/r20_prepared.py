"""PREPARED-BUT-UNREGISTERED r20 registration cohort (the documented
prepared-add pattern): five driver-shaped queries over the r19 library
capabilities, each carrying its planned registry name and reusing the
SINGLE-SOURCED oracle from its operator module. This module is NOT
imported by queries.py — nothing here touches the live registry until
the r20 flip (decorate with @query, add the import, append ledger rows
in flip order, append bench HEADLINE, run the import-isolation gate,
recompute the sweep head). Gate until then:
tests/test_r20_prepared.py drives every pair through
assert_matches_oracle — the driver-equivalent compare.

Planned names (r20 plan, OPERATORS.md): lm_ppl_scores,
pmi_collocations, cbf_fp_cells, cms_token_cells, corpus_overlap_bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cbf import CBF_FP_ORACLE, CBF_ORACLE_K, CBF_ORACLE_M, cbf_counts
from ..operators.cms import (
    CMS_ORACLE_D,
    CMS_ORACLE_W,
    CMS_TOKENS_ORACLE,
    cms_counts,
)
from ..operators.hll_overlap import hll_overlap_report, hll_side_sketch
from ..operators.lm import LM_PPL_ORACLE, lm_score, lm_train
from ..operators.pmi import PMI_ORACLE, pmi_counts, pmi_score
from ..sources.batch import load_table

# planned: @query("lm_ppl_scores", oracle=LM_PPL_ORACLE)
def q_lm_ppl_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained add-k bigram perplexity per document (the CCNet
    quality signal; operators/lm.py carries the model algebra, laws,
    and the 100 TB maintenance story). Self-training on the scored
    corpus is the standard corpus-statistics shape every other
    registered text row uses."""
    docs = load_table(spark, sf_dir, "documents")
    return lm_score(docs, lm_train(docs)).orderBy("doc_id")


# planned: @query("pmi_collocations", oracle=PMI_ORACLE)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI/NPMI collocation candidates at the default min-count floor
    (operators/pmi.py: log-sum form, vocabulary-sized scoring)."""
    return pmi_score(pmi_counts(load_table(spark, sf_dir, "documents")))


# planned: @query("cbf_fp_cells", oracle=CBF_FP_ORACLE)
def q_cbf_fp_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting-Bloom admission-screen state over the corpus fingerprint
    set (md5 twin at the oracle operating point) — a deterministic
    SKETCH STATE with a bit-identical cross-engine oracle, like the
    registered simhash signature row."""
    fps = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(F.lower(F.trim("text"))).alias("key"))
        .distinct()
    )
    return cbf_counts(
        fps, m=CBF_ORACLE_M, k=CBF_ORACLE_K, hash_fn="md5"
    ).orderBy("pos")


# planned: @query("cms_token_cells", oracle=CMS_TOKENS_ORACLE)
def q_cms_token_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turnstile Count-Min cell state over the token stream (md5 twin
    at the oracle operating point)."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("key")
    )
    return cms_counts(
        toks, w=CMS_ORACLE_W, d=CMS_ORACLE_D, hash_fn="md5"
    ).orderBy("j", "bucket")


# The bound-checked pattern (approx_distinct_bounds precedent): Spark
# reports the exact value AND the sketch-within-budget flag; the oracle
# recomputes the exact value with literal TRUE flags.
CORPUS_OVERLAP_BOUNDS_ORACLE = """
WITH a AS (
  SELECT DISTINCT md5(lower(trim(text))) AS k FROM documents
  WHERE doc_id % 3 <> 0
), b AS (
  SELECT DISTINCT md5(lower(trim(text))) AS k FROM documents
  WHERE doc_id % 3 <> 1
)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
       CAST((SELECT count(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b))
            AS BIGINT) AS exact_intersection,
       TRUE AS intersection_within_budget
"""


# planned: @query("corpus_overlap_bounds", oracle=CORPUS_OVERLAP_BOUNDS_ORACLE)
def q_corpus_overlap_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-cost corpus overlap, bound-checked against exact SQL: two
    fingerprint slices of the documents table, the HLL
    inclusion-exclusion intersection must land within its own reported
    err_budget of the exact intersection (operators/hll_overlap.py
    carries the estimator, the budget contract, and the laws)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text"))).alias("key")
    a = docs.filter(F.col("doc_id") % 3 != 0).select(fp)
    b = docs.filter(F.col("doc_id") % 3 != 1).select(fp)
    rep = hll_overlap_report(hll_side_sketch(a), hll_side_sketch(b))
    exact_a = a.distinct().agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
    exact_b = b.distinct().agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
    exact_i = (
        a.distinct()
        .join(b.distinct(), "key", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return (
        exact_a.crossJoin(F.broadcast(exact_b))
        .crossJoin(F.broadcast(exact_i))
        .crossJoin(F.broadcast(rep))
        .select(
            "exact_a",
            "exact_b",
            "exact_intersection",
            (
                F.abs(F.col("est_intersection") - F.col("exact_intersection"))
                <= F.col("err_budget")
            ).alias("intersection_within_budget"),
        )
    )
