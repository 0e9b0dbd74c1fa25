r"""Corpus-preparation operators a large-scale training-data pipeline runs
between raw text and tokenization: document chunking, deterministic
train/validation splitting, vocabulary n-gram counting, and benchmark
decontamination. Each is a pure built-in composition with an exact DuckDB
oracle.

Scale notes:
- Chunking is a per-row transform + explode: O(total tokens) narrow rows,
  no shuffle until the consumer aggregates.
- The split is a DETERMINISTIC hash of doc_id (md5-based so the oracle can
  recompute it) — rerunning the pipeline yields the same split, and no
  driver-side randomness exists to desync executors.
- N-gram counting shuffles (ngram, 1) pairs with map-side partial
  aggregation; top-k is TakeOrderedAndProject.
- Decontamination broadcasts the (small) benchmark-phrase list against the
  corpus — an existence flag per doc, not a join explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


# --- document chunking -----------------------------------------------------
# Fixed-size token windows with overlap (size 40, stride 30): the standard
# pre-tokenization chunker. Output: (doc_id, chunk_id, n_chunk_tokens,
# chunk_text). Every doc yields >= 1 chunk (short docs -> one short chunk).
_CHUNK_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
c AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_id,
         list_slice(toks, 1 + i * 30, LEAST(40 + i * 30, len(toks))) AS chunk
  FROM t, UNNEST(range(0, GREATEST(1, CAST(ceil((len(toks) - 10) / 30.0) AS BIGINT)))) AS u(i)
)
SELECT doc_id, chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


@query("doc_chunks", oracle=_CHUNK_ORACLE)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    size, stride = 40, 30
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    # number of chunks = ceil((n - (size - stride)) / stride), min 1
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("toks") - F.lit(size - stride)) / F.lit(stride)).cast("long"),
    )
    chunks = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        "toks",
    ).select(
        "doc_id",
        "chunk_id",
        F.slice(
            F.col("toks"),
            F.col("chunk_id") * stride + 1,
            F.least(
                F.lit(size),
                F.size("toks") - F.col("chunk_id") * stride,
            ),
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


# --- deterministic train/validation split ----------------------------------
# Hash-mod split on doc_id (md5 of the id string, first 8 hex chars), 90/10.
# Deterministic and oracle-reproducible; at 100 TB the split is a pure
# narrow projection, no sampling state.
_SPLIT_ORACLE = """
WITH h AS (
  SELECT doc_id,
         cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 9 THEN 'train' ELSE 'validation' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM h GROUP BY 1 ORDER BY 1
"""


@query("train_validation_split", oracle=_SPLIT_ORACLE)
def q_train_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.when(bucket < 9, "train").otherwise("validation").alias("split"),
            "doc_id",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


# --- vocabulary n-grams ----------------------------------------------------
# Top-25 corpus bigrams: the vocabulary-building aggregate. Partial
# aggregation map-side, TakeOrderedAndProject for the top-k.
_BIGRAM_ORACLE = rf"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM t, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 25
"""


@query("top_bigrams", oracle=_BIGRAM_ORACLE)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks")
    )
    bigrams = docs.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))")
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(25)
    )


# --- benchmark decontamination ---------------------------------------------
# Flag documents containing any of a broadcast list of benchmark phrases
# (substring containment on normalized text) — the decontamination screen
# every pretraining pipeline runs. Output: per-phrase hit counts plus the
# clean-corpus count. Two phrases occur in the corpus (non-vacuous hits);
# the third never does, pinning the zero-hit path.
_BENCH_PHRASES = ["table hash", "customer join", "benchmark answer key"]

_DECONTAM_ORACLE = rf"""
WITH norm AS (
  SELECT doc_id, lower(trim(text)) AS t FROM documents
),
hits AS (
  SELECT p.phrase, CAST(count(norm.doc_id) AS BIGINT) AS n_docs
  FROM (VALUES {", ".join(f"('{p}')" for p in _BENCH_PHRASES)}) AS p(phrase)
  LEFT JOIN norm ON contains(norm.t, p.phrase)
  GROUP BY p.phrase
),
clean AS (
  SELECT 'CLEAN' AS phrase, CAST(count(*) AS BIGINT) AS n_docs
  FROM norm
  WHERE NOT EXISTS (
    SELECT 1 FROM (VALUES {", ".join(f"('{p}')" for p in _BENCH_PHRASES)}) AS p(phrase)
    WHERE contains(norm.t, p.phrase)
  )
)
SELECT phrase, n_docs FROM hits
UNION ALL
SELECT phrase, n_docs FROM clean
ORDER BY phrase
"""


@query("benchmark_decontamination", oracle=_DECONTAM_ORACLE)
def q_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE scan: per-doc containment flags for every phrase, aggregated to
    per-phrase hit counts plus the no-phrase-hit count, then pivoted to
    (phrase, n_docs) rows from the single aggregate row. (The first
    formulation LEFT-joined a phrase table against the corpus via a
    nested-loop containment join and re-scanned the corpus for the clean
    count — two text scans and a BNLJ that this replaces.)"""
    t = F.lower(F.trim(F.col("text")))
    flags = load_table(spark, sf_dir, "documents").select(
        *[t.contains(p).alias(f"h{i}") for i, p in enumerate(_BENCH_PHRASES)]
    )
    none_hit = F.lit(True)
    for i in range(len(_BENCH_PHRASES)):
        none_hit = none_hit & ~F.col(f"h{i}")
    agg = flags.agg(
        *[F.count_if(F.col(f"h{i}")).alias(f"n{i}") for i in range(len(_BENCH_PHRASES))],
        F.count_if(none_hit).alias("n_clean"),
    )
    rows = F.array(
        *[
            F.struct(F.lit(p).alias("phrase"), F.col(f"n{i}").alias("n_docs"))
            for i, p in enumerate(_BENCH_PHRASES)
        ],
        F.struct(F.lit("CLEAN").alias("phrase"), F.col("n_clean").alias("n_docs")),
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.phrase", "r.n_docs")
        .orderBy("phrase")
    )
