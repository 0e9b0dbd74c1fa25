"""Source reputation — Bayesian-shrunk quality per provenance domain
(r16 lookahead, prepared in the r14 continuation).

A 100 TB curation pipeline doesn't score documents in isolation: it
maintains a per-domain prior (is this host's content usually worth
keeping?) and uses it to gate crawl priority and sampling weight. The
naive per-source mean is unusable for that — a source seen 3 times with
lucky scores outranks a source seen 50 000 times at a solid 0.8. The
standard fix is shrinkage toward the global mean with a pseudo-count
prior (the Bayesian average every large ranking system uses):

    reputation = (n * mean_quality + K * global_mean) / (n + K)

so small-n sources sit near the global mean and only sustained evidence
moves them. ``source`` plays the domain key on this corpus (the
``quality_percentile_by_source`` / ``domain_frequency_cap`` convention).

100 TB design: one pass computes per-doc quality (columnar expressions,
no UDFs — ``operators/text.quality_score``), one hash aggregate per
source (partial map-side), and the global mean is a single-row frame
cross-joined with an explicit broadcast (the broadcast-scalar stats
idiom — O(sources) rows never shuffle twice, and the scalar join can
never be planned as a shuffle join). Output is O(distinct sources),
thousands at web scale — driver-safe by construction.

Registration state: REGISTERED in the r17 flip (``@query`` + queries.py
import + QUERY_LEDGER.json row) after two rounds prepared; also gated by
tests/test_reputation.py through the driver-equivalent
assert_matches_oracle harness.

Reference parity note: the reference (StreamJob.java) has no document
corpus at all — this is part of the LLM-pipeline extension's curation
arc, following the domain-prior weighting described in public corpus
reports (e.g. CCNet / RefinedWeb quality-bucket methodology).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import quality_score
from ..queries import query
from ..sources.batch import load_table
from ._span_shared import _QUALITY_ORACLE

# Pseudo-count prior: a source needs ~this many docs before its own mean
# dominates the global prior. ONE definition, interpolated into the
# oracle and imported by the law tests (the _POLITENESS_WINDOW_MS
# single-sourcing convention).
_REPUTATION_PRIOR_N = 25

SOURCE_REPUTATION_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
s AS (
  SELECT d.source, q.quality
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         avg(quality) AS mean_q
  FROM s GROUP BY source
),
g AS (SELECT avg(quality) AS gmean FROM s)
SELECT source, n_docs,
       round(mean_q, 6) AS mean_quality,
       round((n_docs * mean_q + {_REPUTATION_PRIOR_N} * gmean)
             / (n_docs + {_REPUTATION_PRIOR_N}), 6) AS reputation
FROM per CROSS JOIN g ORDER BY source
"""


def source_reputation(docs: DataFrame, prior_n: int = _REPUTATION_PRIOR_N) -> DataFrame:
    """Per-source shrunk quality on a documents frame. LAWS (test-pinned):
    reputation lies between mean_quality and the global mean (shrinkage
    never extrapolates), and the gap to the source's own mean is exactly
    prior_n / (n_docs + prior_n) of the (global - source) gap — so it
    vanishes as evidence accumulates. Unordered output:
    (source, n_docs, mean_quality, reputation)."""
    q = quality_score(docs).select("source", "quality")
    per = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("quality").alias("mean_q"),
    )
    g = q.agg(F.avg("quality").alias("gmean"))
    rep = (F.col("n_docs") * F.col("mean_q") + prior_n * F.col("gmean")) / (
        F.col("n_docs") + F.lit(prior_n)
    )
    return per.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        F.round("mean_q", 6).alias("mean_quality"),
        F.round(rep, 6).alias("reputation"),
    )


# --- planned registry name: source_reputation_scores ------------------------


@query("source_reputation_scores", oracle=SOURCE_REPUTATION_ORACLE)
def q_source_reputation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain reputation over the documents table: per source, its doc
    count, raw mean quality, and the Bayesian-average reputation that a
    frontier ranker or sampling-weight stage would actually consume."""
    return source_reputation(load_table(spark, sf_dir, "documents")).orderBy("source")
