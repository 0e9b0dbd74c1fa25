"""Embedding similarity search (LLM extension): brute-force cosine top-k as
the exact baseline, random-hyperplane LSH bucketing as the approximate scale
path, and vector aggregation (per-label centroids).

Scale design (100 TB):
- Brute-force top-k against ONE query vector is a narrow map + TakeOrdered —
  embarrassingly parallel, no shuffle; fine at any scale and the exactness
  baseline for recall measurement.
- All-pairs similarity is O(n²) — never run raw at scale. The LSH path
  buckets vectors by sign patterns of deterministic pseudo-random
  hyperplanes (hash-seeded, reproducible across runs/executors with no
  driver-side randomness), so the self-join only pairs within buckets.
- Dot products use `aggregate(zip_with(...))` — JVM columnar loop per row,
  no Python. For very wide vectors a vectorized pandas_udf over Arrow would
  amortize better; at dim=64 the built-in expression wins (no serialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    Plans as scan -> project -> TakeOrderedAndProject (per-partition heap)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(F.col(vec_col), q), 5).alias("sim")
    return (
        embeddings.select(id_col, sim)
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs cosine (small-scale / verification path only).
    Norms are computed once per side before the pair join, so each of the
    O(n²) pairs folds the vectors once (dot) instead of three times."""
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("nrm")
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("nrm").alias("na")
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 5).alias("sim"),
    )


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``n_planes``
    deterministic pseudo-random hyperplanes. Plane p's component for
    dimension d is derived from xxhash64(p, d) mapped to [-1, 1] — fully
    reproducible, no driver-side RNG, no broadcast of a plane matrix."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        # h(p,d) in [-1,1): hash to 32-bit, scale. zip_with over the vector
        # and its index sequence gives the projection sum.
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, d: x.cast("double")
                * ((F.xxhash64(F.lit(p), d).bitwiseAND(F.lit(0xFFFFFFFF)) / F.lit(2147483648.0)) - 1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, p))
    return embeddings.select(id_col, vec_col, sig.alias("bucket"))


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact cosine
    within it. The scale path — candidate set is ~n/2^planes."""
    bucketed = lsh_hyperplane_buckets(embeddings, n_planes, id_col, vec_col)
    # Compute the query's bucket with the same hash-derived planes, in-plan
    # (single-row DataFrame cross-joined as a broadcast literal).
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col}: array<double>")
    qbucket = lsh_hyperplane_buckets(qdf, n_planes, vec_col, vec_col).select(
        F.col("bucket").alias("q_bucket")
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.join(F.broadcast(qbucket), F.col("bucket") == F.col("q_bucket"))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid via posexplode + per-dimension avg — the shuffle
    carries (label, dim, partial_sum), i.e. O(labels*dims), not O(rows).
    Output is flat (label, dim, centroid_val) for engine-agnostic compare."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    return (
        exploded.groupBy(label_col, "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )
