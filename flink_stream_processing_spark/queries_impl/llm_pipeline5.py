"""LLM-pipeline wave 5: leakage-safe splitting and tokenizer-training
counting.

Two operations every production training-data pipeline runs that the
registry did not yet cover:

- ``leakage_safe_split``: a train/validation split that assigns whole
  NEAR-DUP CLUSTERS to one side. A plain per-doc hash split (the
  ``train_validation_split`` query) leaks: when doc A (train) and its
  near-duplicate B (validation) straddle the boundary, validation loss
  measures memorization, not generalization. Splitting on the cluster
  representative instead of the doc id makes crossing impossible by
  construction.
- ``bpe_merge_candidates``: the first-iteration BPE merge count —
  adjacent character-pair frequencies weighted by word frequency — the
  core scan of byte-pair-encoding tokenizer training (Sennrich et al.
  2016), counted over unique words so work scales with vocabulary, not
  corpus tokens.

No reference twin (LLM-data extension, SURVEY.md §2.6 scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table
from ._shared_oracles import JACCARD_CTES as _JACCARD_CTES

# Oracle: exact all-pairs Jaccard — COMPOSED from the shared _JACCARD_CTES
# constant (llm_dedup.py), not a pasted copy, so the shingle convention
# (tokenizer regex, n=3, DISTINCT, rounding) can never silently diverge
# from the near-dup oracles gating the same operators -> transitive
# closure by recursive CTE (same shape as near_dup_clusters' oracle) ->
# singleton docs keep themselves as representative -> md5-bucket the
# REPRESENTATIVE (the proven train_validation_split hash idiom, keyed one
# level up).
_LEAKAGE_SPLIT_ORACLE = _JACCARD_CTES.replace(
    "WITH toks", "WITH RECURSIVE toks", 1
) + """
, pe AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
e AS (SELECT doc_a AS a, doc_b AS b FROM pe UNION SELECT doc_b, doc_a FROM pe),
nodes AS (SELECT DISTINCT a AS n FROM e),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
alldocs AS (
  SELECT d.doc_id,
         CAST(coalesce(cc.cluster_rep, d.doc_id) AS BIGINT) AS cluster_rep
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
),
h AS (
  SELECT doc_id, cluster_rep,
         cast('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 8) AS BIGINT)
           % 10 AS bucket
  FROM alldocs
)
SELECT doc_id, cluster_rep,
       CASE WHEN bucket < 9 THEN 'train' ELSE 'validation' END AS split
FROM h ORDER BY doc_id
"""


@query("leakage_safe_split", oracle=_LEAKAGE_SPLIT_ORACLE)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware 90/10 split: near-dup clusters (recall-certified LSH
    pairs -> min-label connected components) are hashed by their
    REPRESENTATIVE, so no near-duplicate pair can straddle train and
    validation (invariant pinned in tests/test_edge_cases.py). Singleton
    docs are their own cluster.

    Scale (100 TB): the clustering is the existing near-dup scale path
    (banded LSH + O(edges)-per-round CC — never all-pairs); on top of it
    the split adds ONE left join on doc_id (narrow 8-byte rows on the CC
    side) and a per-row hash — no new wide operation. The same property
    CANNOT be had cheaper: any split that respects similarity clusters
    must compute the clusters.

    Oracle = exact-Jaccard transitive closure (recursive CTE) + the same
    md5 bucketing, so one hash match gates LSH recall, the iterative
    clustering, AND the split assignment."""
    from ..operators.dedup import connected_components, minhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5)
    cc = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("rep")
    )
    clustered = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep", "doc_id").cast("long").alias("cluster_rep"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster_rep").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    return clustered.select(
        "doc_id",
        "cluster_rep",
        F.when(bucket < 9, "train").otherwise("validation").alias("split"),
    ).orderBy("doc_id")


# First-iteration BPE merge counting. Tokenization mirrors the corpus
# convention (whitespace split of lower(trim(text))); single-char words
# have no adjacent pair and drop out on both sides via len >= 2.
_BPE_ORACLE = r"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
),
wf AS (
  SELECT word, count(*) AS freq FROM w WHERE len(word) >= 2 GROUP BY word
),
p AS (
  SELECT substr(word, i, 1) || substr(word, i + 1, 1) AS pair, freq
  FROM wf, UNNEST(range(1, len(word))) AS u(i)
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 25
"""


@query("bpe_merge_candidates", oracle=_BPE_ORACLE)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 BPE merge candidates: adjacent character-pair counts
    weighted by word frequency — the aggregate each BPE training
    iteration maximizes.

    Scale (100 TB): the corpus-sized work is ONE word-frequency aggregate
    (map-side partial combine on the exploded tokens); the character-pair
    explode then runs over UNIQUE words only — vocabulary-sized, orders
    of magnitude smaller than the corpus (the standard BPE-training
    factorization). Pair counting is a second partially-aggregated
    groupBy; top-k is the TakeOrdered heap, never a global sort. All
    per-row work is JVM string expressions (substring is codepoint-based
    on both engines — the unicode pin the fuzzy operators established)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.length("word") >= 2)
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1), "
                "i -> concat(substring(word, i, 1), substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(25)
    )
