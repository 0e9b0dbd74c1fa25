"""Retrieval queries (LLM extension): exact BM25 lexical top-k and hybrid
lexical+vector search fused with reciprocal-rank fusion (RRF) — the
standard RAG retrieval stack (sparse retriever ⊕ dense retriever ⊕ rank
fusion), expressed entirely in DataFrame ops with full DuckDB oracles.

Scale design (100 TB):
- BM25: postings build is the inverted-index shuffle (O(tokens) narrow
  rows); query terms broadcast; df via one analytic count; top-k heap.
- dense side: brute-force cosine against a literal query vector — plans
  as scan -> project -> TakeOrderedAndProject (the recall baseline; the
  ANN paths in llm_similarity are the scale variant).
- fusion: two k-row inputs full-outer-joined on id — driver-free and
  constant-size regardless of corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import cosine_topk
from ..operators.text import bm25_topk
from ..queries import query
from ..sources.batch import load_table
from ._shared_exprs import query_vec as _query_vec

# BM25 CTE chain lives in _shared_oracles (also consumed by retrieval2's
# hybrid-RRF oracle); ``{k}`` is the candidate depth placeholder.
from ._shared_oracles import BM25_CTE as _BM25_CTE

_BM25_ORACLE = (
    "WITH "
    + _BM25_CTE.format(k=10)
    + "SELECT doc_id, bm25, lex_rank FROM lex ORDER BY lex_rank"
)


@query("bm25_lexical_topk", oracle=_BM25_ORACLE)
def q_bm25_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Okapi BM25 top-10 with doc 0's token set as the query —
    the sparse-retriever half of a RAG stack. See operators/text.bm25_topk
    for the broadcast/analytic plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, query_doc_id=0, k=10).select(
        "doc_id", "bm25", "lex_rank"
    )


_HYBRID_ORACLE = (
    "WITH "
    + _BM25_CTE.format(k=20)
    + """,
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(embedding::DOUBLE[], v)
               / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(v, v))), 5) AS sim
  FROM embeddings, qv
),
vec AS (
  SELECT doc_id, sim,
         CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rank
  FROM sims ORDER BY sim DESC, doc_id LIMIT 20
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         round(coalesce(1.0 / (60 + l.lex_rank), 0)
               + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf_score
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
"""
)


@query("hybrid_rrf_search", oracle=_HYBRID_ORACLE)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (doc 0's tokens) ⊕ exact cosine
    top-20 (doc 0's embedding; vec_id == doc_id) fused with reciprocal
    -rank fusion, rrf = Σ 1/(60 + rank), final top-10. The fusion joins
    two 20-row inputs — constant work at any corpus scale; each retriever
    keeps its own scale path (broadcast postings probe / TakeOrdered
    scan)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, query_doc_id=0, k=20).select("doc_id", "lex_rank")
    wv = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
    vec = (
        cosine_topk(emb, _query_vec(spark, sf_dir), k=20)
        .withColumn("vec_rank", F.row_number().over(wv).cast("long"))
        .select(F.col("vec_id").alias("doc_id"), "vec_rank")
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            F.round(
                F.coalesce(1.0 / (F.col("lex_rank") + 60), F.lit(0.0))
                + F.coalesce(1.0 / (F.col("vec_rank") + 60), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    wr = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
        .withColumn("rank", F.row_number().over(wr).cast("long"))
    )
