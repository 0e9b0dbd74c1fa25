"""Near-duplicate detection queries (LLM extension). The exact
shingle-Jaccard path has a full DuckDB oracle; the MinHash-LSH and SimHash
paths are approximate/hash-seeded (xxhash64 has no DuckDB equivalent) and
register as rows-only checks — their *verification* stage reuses the
oracle-backed exact Jaccard."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    jaccard_pairs,
    minhash_near_dups,
    simhash,
    simhash_near_dups,
    word_shingles,
)
from ..queries import query
from ..sources.batch import load_table

# Exact word-3-gram Jaccard: top-20 most similar pairs (deterministic order:
# jaccard desc, then pair ids). DuckDB mirrors the same shingle construction.
_JACCARD_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""


@query("near_dup_topk_pairs", oracle=_JACCARD_ORACLE)
def q_near_dup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(load_table(spark, sf_dir, "documents"))
    return (
        jaccard_pairs(sh)
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


@query("minhash_lsh_near_dups")  # rows-only: LSH candidate recall is probabilistic
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: shingle -> 32-perm MinHash -> 8-band LSH -> exact verify.
    Output pairs with verified jaccard >= 0.3."""
    return minhash_near_dups(
        load_table(spark, sf_dir, "documents"), threshold=0.3
    ).orderBy("doc_a", "doc_b")


@query("simhash_signatures")  # rows-only: xxhash64 has no DuckDB equivalent
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


@query("simhash_near_dups")  # rows-only
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dups(
        load_table(spark, sf_dir, "documents"), max_hamming=16
    ).orderBy("doc_a", "doc_b")
