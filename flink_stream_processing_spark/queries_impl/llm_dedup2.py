"""Round-4 dedup additions: exact set-similarity join (prefix filtering).

``allpairs_jaccard_join`` is the EXACT counterpart to the MinHash-LSH and
SimHash approximate paths: same word-3-gram shingle construction, but the
candidate bound is the AllPairs/PPJoin prefix filter — provably complete,
so recall is 1.0 by algorithm, not by parameter tuning. The oracle is the
brute-force all-pairs Jaccard at the same threshold; a hash match certifies
the prefix filter lost nothing.

Threshold 0.6 = 3/5: both sides apply it in integer arithmetic
(inter*5 >= union*3) so no float boundary can diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.setsim import allpairs_jaccard_join
from ..queries import query
from ..sources.batch import load_table
from ._shared_oracles import JACCARD_CTES as _JACCARD_CTES

_ALLPAIRS_ORACLE = (
    _JACCARD_CTES
    + """
SELECT doc_a AS id_a, doc_b AS id_b,
       round(c * 1.0 / (sa.n + sb.n - c), 5) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 5 >= (sa.n + sb.n - c) * 3
ORDER BY id_a, id_b
"""
)


@query("allpairs_jaccard_join", oracle=_ALLPAIRS_ORACLE)
def q_allpairs_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.6 near-dup pairs via prefix-filtered candidate
    generation — no probabilistic step. The scale story vs the O(n²)
    verification path: candidates come only from RARE (rare-first prefix)
    shingles, so the self-join volume is sum(prefix-df²), not n²."""
    docs = load_table(spark, sf_dir, "documents")
    return allpairs_jaccard_join(docs, threshold=0.6).orderBy("id_a", "id_b")


_CONTAINMENT_ORACLE = (
    _JACCARD_CTES
    + """
, dirs AS (
  SELECT doc_a AS id_sub, doc_b AS id_super,
         round(c * 1.0 / sa.n, 5) AS containment,
         c * 5 >= sa.n * 4 AS keep
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  UNION ALL
  SELECT doc_b, doc_a, round(c * 1.0 / sb.n, 5), c * 5 >= sb.n * 4
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT id_sub, id_super, containment FROM dirs WHERE keep
ORDER BY id_sub, id_super
"""
)


@query("containment_join", oracle=_CONTAINMENT_ORACLE)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment >= 0.8 (4/5) pairs: sub-documents whose shingle
    set is mostly inside another document — the asymmetric inclusion
    relation (quotes, boilerplate embedding) Jaccard under-scores when the
    host is large. Oracle = brute-force containment in both directions at
    the same integer-exact threshold."""
    from ..operators.setsim import containment_join

    docs = load_table(spark, sf_dir, "documents")
    return containment_join(docs, threshold=0.8).orderBy("id_sub", "id_super")
