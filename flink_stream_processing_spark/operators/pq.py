"""Product quantization (PQ) for compressed-domain ANN search.

Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each d-dim vector into m subvectors, quantize each to
its nearest per-subspace centroid (the CODE, one byte for <=256 centroids),
and answer queries with the Asymmetric Distance Computation (ADC): the
query's squared distance to each centroid is precomputed per subspace
(m*k table entries), and a vector's approximate distance is the sum of m
table lookups on its codes — no float math against the corpus at query
time.

Scale design (100 TB):
- Codes compress the corpus m bytes/vector (vs 4*d): a billion 64-dim
  float vectors (256 GB) become 4 GB of codes — cache-resident search.
- Encoding is one narrow pass: explode m subvectors per vector, join the
  BROADCAST codebook (m*k tiny rows), argmin per (vector, subspace). The
  only wide op is the final top-k (TakeOrderedAndProject).
- The ADC lookup table is built once per query from the same broadcast
  codebook — per-query cost is O(m*k) floats, independent of corpus size.
- Codebooks here are deterministic (the first k corpus vectors sliced per
  subspace) so the DuckDB oracle reproduces codes AND distances exactly;
  a production deployment swaps in k-means-trained centroids
  (kmeans_assign_update is the training loop) without touching this
  encode/search shape.

All distance math is double-precision dot products arranged identically on
both engines (d2 = v·v - 2 v·c + c·c, pairwise-multiply-then-left-fold),
so argmin codes and ADC sums are bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    """Left-fold pairwise dot product — the same evaluation order DuckDB's
    list_dot_product uses, so cross-engine doubles match bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def pq_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub, code, d2) PQ code assignment: per subspace, the nearest of
    the k deterministic centroids (corpus vectors 0..k-1, sliced). Ties
    break to the lowest code via struct-min ordering."""
    v = F.col(vec_col).cast("array<double>")
    # subspace width derived in-plan (no driver collect): slice bounds use
    # size(v)/m per row — constant-folded for fixed-width corpora.
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    w = (F.size(F.col("v")) / m).cast("int")
    # r19: the m-way subspace explode + k broadcast-codebook distance folds
    # do O(m*k*width) float work per input row; on the driver's single-split
    # scan that all ran in ONE task (profiled 0.9 s at sf0.1). Spread is
    # size-gated — a no-op once the corpus scan has real splits.
    from .parallelism import spread_fanout

    vexp = spread_fanout(emb.select(F.col(id_col), v.alias("v"))).select(
        id_col, "v", sub
    ).select(
        id_col, "sub", F.slice("v", F.col("sub") * w + 1, w).alias("sv")
    )
    cb = (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("code"), v.alias("v"), sub)
        .select("code", "sub", F.slice("v", F.col("sub") * w + 1, w).alias("cent"))
    )
    j = vexp.join(F.broadcast(cb), "sub")
    d2 = _dot("sv", "sv") - 2 * _dot("sv", "cent") + _dot("cent", "cent")
    return (
        j.select(id_col, "sub", "code", d2.alias("d2"))
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("d2", "code")).alias("m"))
        .select(id_col, "sub", F.col("m.code").alias("code"))
    )


def pq_adc_topk(
    emb: DataFrame,
    query_id: int = 0,
    m: int = 4,
    k: int = 16,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``topk`` by ADC distance to the embedding of ``query_id``:
    codes from :func:`pq_encode`, distances = sum over subspaces of the
    query->assigned-centroid squared distance (the m*k lookup table,
    broadcast). Output: id, code0..code{m-1}, adc_dist."""
    v = F.col(vec_col).cast("array<double>")
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    w = (F.size(F.col("v")) / m).cast("int")
    cb = (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("code"), v.alias("v"), sub)
        .select("code", "sub", F.slice("v", F.col("sub") * w + 1, w).alias("cent"))
    )
    q = (
        emb.filter(F.col(id_col) == query_id)
        .select(v.alias("v"), sub)
        .select("sub", F.slice("v", F.col("sub") * w + 1, w).alias("qs"))
    )
    qd2 = _dot("qs", "qs") - 2 * _dot("qs", "cent") + _dot("cent", "cent")
    lut = cb.join(F.broadcast(q), "sub").select("sub", "code", qd2.alias("qd2"))

    codes = pq_encode(emb, m=m, k=k, id_col=id_col, vec_col=vec_col)
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(
            F.sum("qd2").alias("adc_dist"),
            *[
                F.max(F.when(F.col("sub") == s, F.col("code"))).alias(f"code{s}")
                for s in range(m)
            ],
        )
    )
    return scored.select(
        id_col,
        *[f"code{s}" for s in range(m)],
        F.round("adc_dist", 5).alias("adc_dist"),
    ).orderBy("adc_dist", id_col).limit(topk)
