"""Embedding similarity-search queries (LLM extension) over ``embeddings``
(array<float>, dim 64). Exact paths carry DuckDB oracles (list math on
DOUBLE[]); the LSH/ANN path is hash-seeded and registers rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_topk_lsh,
    cosine,
    cosine_topk,
    label_centroids,
    pairwise_cosine,
)
from ..queries import query
from ..sources.batch import load_table


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query vector: embedding of vec_id 0 (deterministic lookup; a
    single-row collect, not a driver-side loop)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


_COSINE_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 5) AS sim
FROM embeddings, q
ORDER BY sim DESC, vec_id
LIMIT 10
"""


@query("cosine_topk", oracle=_COSINE_ORACLE)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 — the ANN recall baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


_PAIRWISE_ORACLE = """
WITH sub AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id % 4 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 5) AS sim
FROM sub a JOIN sub b ON a.vec_id < b.vec_id
ORDER BY sim DESC, id_a, id_b
LIMIT 50
"""


@query("pairwise_cosine_topk", oracle=_PAIRWISE_ORACLE)
def q_pairwise_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine on a deterministic subset (vec_id % 4 == 0) —
    the O(n²) verification path; the scale path is LSH bucketing below."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    return (
        pairwise_cosine(emb)
        .orderBy(F.col("sim").desc(), "id_a", "id_b")
        .limit(50)
    )


_CENTROID_ORACLE = """
WITH x AS (
  SELECT label,
         unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
SELECT label, CAST(i - 1 AS INTEGER) AS dim, round(avg(v), 6) AS centroid_val
FROM x GROUP BY label, i
"""


@query("label_centroids", oracle=_CENTROID_ORACLE)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (vector aggregation as flat (label, dim, value))."""
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb).withColumn("dim", F.col("dim").cast("int"))


@query("ann_lsh_topk")  # rows-only: hash-seeded hyperplanes, approximate
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH bucket probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(emb, _query_vec(spark, sf_dir), k=10, n_planes=6)


@query("embedding_near_dup_pairs")  # rows-only: LSH-bucketed near-dup scan
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, LSH-bucketed: pairs in the same
    hyperplane bucket with cosine >= 0.95 (the dedup-by-embedding pattern)."""
    from ..operators.similarity import lsh_hyperplane_buckets

    bucketed = lsh_hyperplane_buckets(
        load_table(spark, sf_dir, "embeddings"), n_planes=6
    )
    a = bucketed.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 5).alias("sim"))
        .filter(F.col("sim") >= 0.95)
        .orderBy("id_a", "id_b")
    )
