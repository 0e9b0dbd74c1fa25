"""Distributed PageRank in plain DataFrame ops (companion to the
connected-components propagation in operators/dedup.py — together they
cover the two workhorse iterative-graph shapes without GraphX/GraphFrames).

Scale design (100 TB):
- One iteration = one keyed join (ranks on src) + one keyed agg (sum by
  dst) — the exact shuffle profile of Pregel PageRank; nothing else moves.
  Out-degrees are broadcast into the edge relation (O(nodes) ≪ O(edges)).
- The edge list and out-degrees are materialized ONCE (``localCheckpoint``)
  so iterations touch the materialized relations, not the upstream plan
  that built the graph.
- The rank vector is O(nodes) and stays distributed end to end; the node
  count enters the plan as a broadcast single-row DataFrame, not a driver
  constant.
- Ranks are rounded to 6 decimals AFTER each iteration: the per-node
  contribution sum is order-dependent in the last ulps on any distributed
  engine, so pinning each iteration's output makes the fixpoint
  bit-reproducible across engines/partitionings (same convention as the
  seeded-md5 sampling operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Assumes no
    dangling nodes (every node has at least one out-edge) — true by
    construction for symmetrized graphs; callers with genuinely directed
    graphs add the dangling mass term themselves.

    Returns (node, pr) after ``iters`` iterations of
    ``pr(v) = (1-d)/N + d * Σ_{u→v} pr(u)/outdeg(u)``, each iteration
    rounded to 6 decimals (see module docstring).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # ONE materialization: (src, dst, outdeg). The no-dangling contract
    # makes the node set exactly distinct(src), so nodes/N/initial ranks
    # all derive from this relation instead of separate passes over the
    # upstream edge plan.
    contrib_base = e.join(F.broadcast(deg), "src").localCheckpoint(eager=True)
    nodes = contrib_base.select(F.col("src").alias("node")).distinct()
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    ranks = nodes.join(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("nn")).alias("pr")
    )
    for _ in range(iters):
        ranks = (
            contrib_base.join(ranks, contrib_base.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .join(F.broadcast(n_row))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("nn") + F.lit(damping) * F.col("s"), 6
                ).alias("pr"),
            )
        )
    return ranks
