"""Text-analysis + exact-dedup queries over ``documents`` (LLM extension).
Every formula is mirrored exactly in the DuckDB oracle (same tokenizer
regex, same arithmetic order, same rounding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import fingerprint, lang_id, quality_score, token_stats
from ..operators.dedup import exact_dedup
from ..queries import query
from ..sources.batch import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_STATS_ORACLE = f"""
WITH s AS (
  SELECT lang,
         len({_TOKS}) AS n_tokens,
         len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe,
         length(text) AS n_chars
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT)   AS cnt,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(avg(n_tokens), 6)    AS avg_tokens,
       round(avg(n_bpe), 6)       AS avg_bpe_tokens,
       round(avg(n_chars), 6)     AS avg_chars
FROM s GROUP BY lang
"""


@query("text_stats_per_lang", oracle=_STATS_ORACLE)
def q_text_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = token_stats(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("n_bpe_tokens"), 6).alias("avg_bpe_tokens"),
        F.round(F.avg("n_chars_m"), 6).alias("avg_chars"),
    )


_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_tokens,
       round(CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
             / nullif(len({_TOKS}), 0), 6) AS avg_token_len
FROM documents
"""


@query("token_counts", oracle=_TOKEN_COUNT_ORACLE)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "avg_token_len"
    )


# _QUALITY_ORACLE moved to ._span_shared (r17): reputation's registered
# oracle embeds it at module-import time, and an attribute import from
# this module would break while llm_text is itself mid-initialization
# (the _SPAN_WINDOW_CTES partial-init class). Re-exported here so
# existing importers and tests are unaffected; its token split is the
# same _TOKS literal (asserted below so the two can't drift).
from ._span_shared import _QUALITY_ORACLE, _QUALITY_TOKS  # noqa: E402

assert _QUALITY_TOKS == _TOKS


@query("quality_scores", oracle=_QUALITY_ORACLE)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "punct_ratio", "stopword_ratio", "quality"
    )


_LANG_ORACLE = f"""
WITH c AS (
  SELECT doc_id, lang,
         len(list_filter({_TOKS}, x -> list_contains(['the','a','of'], x)))   AS c_en,
         len(list_filter({_TOKS}, x -> list_contains(['le','la','et'], x)))   AS c_fr,
         len(list_filter({_TOKS}, x -> list_contains(['el','los','y'], x)))   AS c_es,
         len(list_filter({_TOKS}, x -> list_contains(['der','die','und'], x))) AS c_de
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(c_en, c_fr, c_es, c_de) = 0 THEN 'und'
            WHEN c_en = greatest(c_en, c_fr, c_es, c_de) THEN 'en'
            WHEN c_fr = greatest(c_en, c_fr, c_es, c_de) THEN 'fr'
            WHEN c_es = greatest(c_en, c_fr, c_es, c_de) THEN 'es'
            ELSE 'de' END AS lang_pred
FROM c
"""


@query("lang_id_ngram", oracle=_LANG_ORACLE)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "lang_pred"
    )


_FP_ORACLE = f"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_TOKS}, x -> CAST(ascii(x) * 7 + length(x) AS BIGINT))),
         (a, b) -> (a * 131 + b) % 1000000007) AS fp_rolling
FROM documents
"""


@query("doc_fingerprints", oracle=_FP_ORACLE)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5", "fp_rolling"
    )


_EXACT_DEDUP_ORACLE = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT)    AS dup_count
FROM documents
GROUP BY 1
"""


@query("dedup_exact_docs", oracle=_EXACT_DEDUP_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on the md5 fingerprint of normalized text — at
    100 TB you group on the 16-byte hash, never the raw document."""
    docs = fingerprint(load_table(spark, sf_dir, "documents"))
    return exact_dedup(docs.withColumnRenamed("fp_md5", "fp"), ["fp"], "doc_id")


# --- Misra–Gries heavy hitters (r19 registration — the executed
# post-saturation swap: this row took the driver slot vacated by
# salted_two_phase_agg, whose gate moved in-suite). Oracle + K constant
# are SINGLE-SOURCED in operators/heavy_hitters.py (an operator leaf, not
# a registered sibling — the r16/r17 import-cycle rule allows this) and
# shared verbatim with tests/test_heavy_hitters.py, so the driver gate
# and the in-suite gate can never drift.
from ..operators.heavy_hitters import (  # noqa: E402
    MG_TOKENS_K,
    MG_TOKENS_ORACLE,
    mg_build,
)
from ..operators.text import tokens_col  # noqa: E402


@query("mg_heavy_hitters_topk", oracle=MG_TOKENS_ORACLE)
def q_mg_heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Misra–Gries token summary of the corpus: ≤ k
    (key, est) counters with the classic guarantee
    0 ≤ true − est ≤ N/(k+1) for EVERY key (operators/heavy_hitters.py
    carries the laws, merge algebra, and the 100 TB story — one
    map-side-combined scan collapsed to k rows; the offset-prune's
    (k+1)-th-largest is a TakeOrderedAndProject heap, never a global
    sort). The offset-prune form is deterministic (δ depends only on the
    count multiset), which is what makes a bit-identical DuckDB oracle
    possible for a SKETCH — est values match exactly, not just the key
    set. Reference parity: the reference keeps no frequency state
    (StreamJob.java has one windowed aggregate); this is the LLM
    corpus-analytics extension's bounded-state frequency member next to
    the randomized count_min_sketch_tokens row."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens_col()).alias("key")
    )
    return mg_build(toks, k=MG_TOKENS_K).counters.orderBy(
        F.desc("est"), "key"
    )
