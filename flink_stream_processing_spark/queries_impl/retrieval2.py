"""Second-stage retrieval + web-dedup queries (LLM extension, r10):

- ``cross_encoder_rerank``: the standard two-stage RAG retrieval shape —
  a cheap first-stage retriever (BM25 top-20, the existing scale path)
  followed by an expensive second-stage scorer applied ONLY to the k
  candidates. A real deployment scores (query, candidate) pairs with a
  cross-encoder model; a neural net has no SQL oracle, so the scorer here
  is its deterministic feature-based stand-in (the classic LTR linear
  model: stage-1 score + token Jaccard + query coverage + length ratio
  under fixed weights). The PLAN is the point: second-stage cost is
  O(k), never O(corpus), and the candidate set rides as a broadcast.

- ``url_normalize_dedup``: URL/host-level dedup normalization — the
  canonicalization pass every web-crawl pipeline runs before exact
  dedup (lowercase scheme+host, strip default ports and ``www.``, drop
  fragments and ``utm_*`` tracking params, sort surviving params, strip
  ``/index.html`` and trailing slashes; scheme canonicalized to https so
  http/https variants of one page collapse). The corpus has no URL
  column, so raw URLs derive DETERMINISTICALLY from (source, lang,
  doc_id) with four messy variants — the same seeded-derivation pattern
  as ``generator_transactions`` (reference_parity.py): the oracle
  recomputes the identical derivation, so what is verified end-to-end is
  the normalizer and the dedup, not synthetic inputs.

Scale design (100 TB):
- rerank: stage 1 keeps bm25_topk's inverted-index plan (postings
  shuffle, broadcast query terms, TakeOrdered heap); stage 2 joins the
  20-row candidate set BROADCAST against the token projection (one
  corpus scan, no shuffle on doc_id) plus a broadcast single-row query
  record — adding a reranker never adds a wide operation.
- url dedup: per-row JVM regex/array projection (whole-stage codegen,
  no Python lane) into ONE hash aggregate on the canonical key — the
  same shape as exact_dedup, which is the textbook 100 TB dedup plan.
  Skewed hosts shard naturally because the KEY is the full canonical
  URL, not the host.

No reference twin (LLM-retrieval/web-dedup extension, SURVEY.md §2 scope
note); reference is a streaming remittance pipeline
(/root/reference/src/main/java — no retrieval or dedup surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.text import bm25_topk, tokens_col
from ..queries import query
from ..sources.batch import load_table
from ._shared_exprs import (
    URL_CANON_CTES as _URL_CANON_CTES,
    canonical_url_col,
    derived_url_col,
)
from ._shared_oracles import BM25_CTE as _BM25_CTE

# LTR weights of the cross-encoder stand-in. A model-served reranker
# would replace this with a broadcast (feature -> weight) table or an
# Arrow-batched scoring UDF over the same O(k) candidate frame; the plan
# does not change. Features are rounded to 5dp BEFORE the weighted sum
# (identical operand doubles on both engines), the sum is written in the
# same textual order in both, and the final score rounds to 5dp before
# ranking; ties break on doc_id.
_W_BM25, _W_JACC, _W_COV, _W_LEN = 0.05, 2.0, 1.5, 0.5

_RERANK_ORACLE = (
    "WITH "
    + _BM25_CTE.format(k=20)
    + f""",
ts AS (SELECT doc_id, list_distinct(toks) AS tset, len(toks) AS dl FROM t),
qd AS (SELECT tset AS qset, dl AS qdl FROM ts WHERE doc_id = 0),
f AS (
  SELECT l.doc_id, l.bm25, l.lex_rank,
         round(CAST(len(list_intersect(ts.tset, qd.qset)) AS DOUBLE)
               / len(list_distinct(ts.tset || qd.qset)), 5) AS tok_jaccard,
         round(CAST(len(list_intersect(ts.tset, qd.qset)) AS DOUBLE)
               / len(qd.qset), 5) AS query_coverage,
         round(CAST(least(ts.dl, qd.qdl) AS DOUBLE)
               / greatest(ts.dl, qd.qdl), 5) AS len_ratio
  FROM lex l JOIN ts USING (doc_id), qd
),
scored AS (
  SELECT doc_id, lex_rank, tok_jaccard, query_coverage, len_ratio,
         round({_W_BM25} * bm25 + {_W_JACC} * tok_jaccard
               + {_W_COV} * query_coverage + {_W_LEN} * len_ratio, 5)
           AS ce_score
  FROM f
)
SELECT doc_id, lex_rank, tok_jaccard, query_coverage, len_ratio, ce_score,
       CAST(row_number() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT)
         AS ce_rank
FROM scored ORDER BY ce_score DESC, doc_id LIMIT 10
"""
)


@query("cross_encoder_rerank", oracle=_RERANK_ORACLE)
def q_cross_encoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 top-20 (doc 0's token set as the query)
    reranked by the feature-based cross-encoder stand-in, final top-10.
    Stage 2 touches exactly 20 (query, candidate) pairs however large the
    corpus is — the candidate set and the single query row both
    broadcast, so the only corpus-sized work remains stage 1's postings
    plan (operators/text.bm25_topk)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = bm25_topk(docs, query_doc_id=0, k=20)
    toksets = docs.select(
        "doc_id", tokens_col().alias("toks")
    ).select(
        "doc_id",
        F.array_distinct("toks").alias("tset"),
        F.size("toks").alias("dl"),
    )
    qd = (
        toksets.filter(F.col("doc_id") == 0)
        .select(F.col("tset").alias("qset"), F.col("dl").alias("qdl"))
    )
    inter = F.size(F.array_intersect("tset", "qset")).cast("double")
    feats = (
        toksets.join(F.broadcast(cands), "doc_id")
        .crossJoin(F.broadcast(qd))
        .select(
            "doc_id",
            "bm25",
            "lex_rank",
            F.round(
                inter / F.size(F.array_distinct(F.concat("tset", "qset"))), 5
            ).alias("tok_jaccard"),
            F.round(inter / F.size("qset"), 5).alias("query_coverage"),
            F.round(
                F.least("dl", "qdl").cast("double") / F.greatest("dl", "qdl"),
                5,
            ).alias("len_ratio"),
        )
    )
    scored = feats.select(
        "doc_id",
        "lex_rank",
        "tok_jaccard",
        "query_coverage",
        "len_ratio",
        F.round(
            _W_BM25 * F.col("bm25")
            + _W_JACC * F.col("tok_jaccard")
            + _W_COV * F.col("query_coverage")
            + _W_LEN * F.col("len_ratio"),
            5,
        ).alias("ce_score"),
    )
    wr = Window.orderBy(F.col("ce_score").desc(), "doc_id")
    return (
        scored.orderBy(F.col("ce_score").desc(), "doc_id")
        .limit(10)
        .withColumn("ce_rank", F.row_number().over(wr).cast("long"))
    )


# Messy-URL derivation + canonicalization (SQL CTEs AND the Spark Column
# twins) live in _shared_exprs — ONE definition consumed by this module's
# batch dedup and web_dedup_stream's streaming twin, so the two gates can
# never diverge on the normalizer.

_URL_DEDUP_ORACLE = f"""
WITH {_URL_CANON_CTES}
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       min(doc_id) AS keep_doc_id
FROM canon GROUP BY canonical_url ORDER BY canonical_url
"""


@query("url_normalize_dedup", oracle=_URL_DEDUP_ORACLE)
def q_url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact dedup on the canonical key (see
    ``canonical_url_col`` for the normalization steps). Keep policy: min
    doc_id per canonical URL, with the variant count. Every step is a JVM
    regex/array expression inside one whole-stage-codegen projection; the
    dedup is a single hash aggregate on the canonical key (map-side
    partials, no skew — the key is the full URL)."""
    docs = load_table(spark, sf_dir, "documents")
    canonical = canonical_url_col(derived_url_col())
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )
