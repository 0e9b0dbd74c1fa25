"""Full k-means loop (operators/clustering.py): convergence behavior and
cluster quality against the labeled embeddings fixture. (The one-step
cross-engine gate is the kmeans_assign_update registry oracle; these
tests cover the iterative part SQL oracles can't express.)"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.clustering import kmeans_fit
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR


def test_kmeans_converges_and_covers_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n_vec = emb.count()
    n_labels = emb.select("label").distinct().count()
    assigned, n_iters = kmeans_fit(emb, k=n_labels, max_iter=15)
    rows = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in rows) == n_vec  # every vector assigned once
    assert 1 <= n_iters <= 15


def test_kmeans_objective_decreases_and_is_deterministic(spark):
    """Lloyd's guarantees: the within-cluster SSE is non-increasing in the
    iteration count, and the algorithm is deterministic (fixed seeds,
    deterministic argmin tie-break). NOTE the fixture's `label` column is
    NOT geometrically planted (within-label spread ~5x the between-label
    centroid distances), so purity-vs-label is not a valid oracle here —
    the algorithmic invariants are."""
    emb = load_table(spark, SF_DIR, "embeddings")

    def sse(assigned_df):
        data = emb.select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        j = assigned_df.join(data, "id")
        cent = (
            j.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.collect_list(F.struct("dim", "m")).alias("dm"))
            .select(
                "cluster",
                F.transform(F.array_sort("dm"), lambda s: s["m"]).alias("c"),
            )
        )
        dist = j.join(F.broadcast(cent), "cluster").select(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2")
        )
        return dist.agg(F.sum("d2")).head()[0]

    one, n1 = kmeans_fit(emb, k=8, max_iter=1)
    conv, n2 = kmeans_fit(emb, k=8, max_iter=12)
    assert n1 == 1 and n2 >= n1
    assert sse(conv) <= sse(one) + 1e-9

    again, _ = kmeans_fit(emb, k=8, max_iter=12)
    a = sorted((r["id"], r["cluster"]) for r in conv.collect())
    b = sorted((r["id"], r["cluster"]) for r in again.collect())
    assert a == b  # bit-deterministic across runs


def test_mmr_single_candidate_query_survives(spark):
    """A query with exactly one candidate must return that candidate at
    rank 1 (the pair self-join alone would drop the whole group)."""
    from flink_stream_processing_spark.operators.similarity import mmr_rerank

    rows = [
        (1, 10, 0.9, [1.0, 0.0]),         # query 1: single candidate
        (2, 20, 0.8, [1.0, 0.0]),         # query 2: two candidates
        (2, 21, 0.7, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double, embedding array<double>"
    )
    out = {(r.query_id, r.rank): r.vec_id for r in mmr_rerank(df, k=2).collect()}
    assert out[(1, 1)] == 10
    assert out[(2, 1)] == 20 and out[(2, 2)] == 21


def test_similarity_rejects_non_integral_ids(spark):
    import pytest

    from flink_stream_processing_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral id"):
        embedding_near_dup_pairs(df, dim=2)
