"""End-to-end training-corpus curation (LLM extension): the composed
pipeline a real data team runs before tokenization — quality filter, exact
dedup, near-dup removal — as ONE declarative query with a full oracle.

Composition rule set (mirrored exactly in the DuckDB oracle):
1. quality >= 0.55 (the quality_scores formula);
2. exact dedup: keep the min doc_id per md5 fingerprint of normalized text;
3. near-dup removal: drop any doc that is the HIGHER id of a near-dup pair
   at Jaccard >= 0.5 (keep-lowest-id policy). The Spark side finds pairs
   with MinHash LSH (the scale path); the oracle uses exact all-pairs
   Jaccard — they agree because LSH recall at this operating point is 1.0
   (gated independently by minhash_lsh_near_dups and tests/test_recall.py),
   so this query ALSO gates that the composition preserves it.

Scale: each stage is a narrow projection or a hash join keyed on doc_id /
fingerprint; nothing here shuffles document text except the shingle pass
inside the LSH stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_near_dups
from ..operators.text import fingerprint, quality_score
from ..queries import query
from ..sources.batch import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_CLEAN_ORACLE = rf"""
WITH b AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS DOUBLE) AS n_toks,
         CAST(len(list_filter({_TOKS},
              x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE) AS sum_len
  FROM documents
),
quality AS (
  SELECT doc_id,
         round(0.3 * least(n_toks / 100.0, 1.0)
               + 0.3 * (1.0 - coalesce(n_punct / nullif(n_chars, 0), 0.0))
               + 0.2 * coalesce(n_stop / nullif(n_toks, 0), 0.0)
               + 0.2 * least(coalesce(sum_len / nullif(n_toks, 0), 0.0) / 10.0, 1.0), 6) AS quality
  FROM b
),
keep_exact AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents)
  GROUP BY fp
),
toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
  WHERE len({_TOKS}) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
near_dropped AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
  HAVING count(*) * 1.0 / (sa.n + sb.n - count(*)) >= 0.5
)
SELECT q.doc_id, q.quality
FROM quality q
JOIN keep_exact k USING (doc_id)
WHERE q.quality >= 0.55
  AND q.doc_id NOT IN (SELECT doc_id FROM near_dropped)
ORDER BY q.doc_id
"""


def corpus_clean(docs: DataFrame, quality_threshold: float = 0.55) -> DataFrame:
    """The composed curation pipeline over a documents table. Returns the
    surviving (doc_id, quality) rows."""
    q = quality_score(docs).select("doc_id", "quality")
    fp = fingerprint(docs).select("doc_id", "fp_md5")
    keep_exact = fp.groupBy("fp_md5").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    near_dropped = (
        minhash_near_dups(docs, threshold=0.5).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    return (
        q.filter(F.col("quality") >= quality_threshold)
        .join(keep_exact, "doc_id", "left_semi")
        .join(near_dropped, "doc_id", "left_anti")
    )


@query("training_corpus_clean", oracle=_CLEAN_ORACLE)
def q_training_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_clean(load_table(spark, sf_dir, "documents")).orderBy("doc_id")
