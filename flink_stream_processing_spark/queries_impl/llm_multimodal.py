"""Multimodal-plumbing query (LLM extension): binary payload ->
Arrow-batched mapInPandas feature extraction. The features (byte length,
sha256) are deterministic, so even the pandas-UDF path gets a full DuckDB
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_media, builtin_feature_extract, fake_feature_extract
from ..queries import query
from ..sources.batch import load_table

_MM_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


@query("multimodal_feature_extract", oracle=_MM_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-plumbing path (mapInPandas) — exercises the exact batch
    shape a real decoder needs; the Python sha256 is the known stub cost."""
    docs = attach_media(load_table(spark, sf_dir, "documents"))
    return fake_feature_extract(docs)


@query("multimodal_feature_extract_builtin", oracle=_MM_ORACLE)
def q_multimodal_features_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fast-path twin: identical features via JVM built-ins
    (length/sha2), sharing the same oracle — so CORRECTNESS cross-checks
    the Arrow plumbing against the codegen path."""
    docs = attach_media(load_table(spark, sf_dir, "documents"))
    return builtin_feature_extract(docs)
