#!/usr/bin/env python
"""One-off r20 profiling: per-phase timing inside connected_components for
the ER d1 graph (525k sym edges, 15k nodes)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_cc")
spark.sparkContext.setLogLevel("ERROR")

QUERIES["window_metrics"](spark, sf).collect()
spark.read.parquet(f"{sf}/customer.parquet").write.mode("overwrite").format("noop").save()
warm = spark.range(0, 2_000_000)
warm.select((F.col("id") % 1000).alias("k"), F.col("id").alias("v")).groupBy("k").count().write.format("noop").mode("overwrite").save()

from flink_stream_processing_spark.operators.text import fuzzy_name_pairs

cust = spark.read.parquet(f"{sf}/customer.parquet")

for rep in range(3):
    pairs = fuzzy_name_pairs(cust, "c_name", max_dist=1).select(
        F.substring("name_a", 10, 9).cast("long").alias("src"),
        F.substring("name_b", 10, 9).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)  # isolate CC timing from pair gen
    marks = []
    t0 = time.perf_counter()

    def mark(label):
        marks.append((label, time.perf_counter() - t0))

    e = pairs
    staged = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    mark("stage distinct+ckpt")
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_edges = staged.count()
    mark(f"count ({n_edges})")
    loop_parts = max(8, min(session_parts, n_edges // 500_000 + 1))
    edges = staged.repartition(loop_parts, "src").localCheckpoint(eager=True)
    mark("repart+ckpt edges")
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("mn"))
        .select("node", F.least(F.col("node"), F.col("mn")).alias("lbl"))
        .repartition(loop_parts, "node")
        .localCheckpoint(eager=True)
    )
    mark("seed labels")
    lbl_type = labels.schema["lbl"].dataType
    for it in range(20):
        neigh = edges.join(
            labels.hint("shuffle_hash"), edges["src"] == labels["node"]
        ).select(
            F.col("dst").alias("node"),
            "lbl",
            F.lit(None).cast(lbl_type).alias("own"),
        )
        new = (
            labels.select("node", "lbl", F.col("lbl").alias("own"))
            .unionByName(neigh)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"), F.max("own").alias("own"))
        )
        hop = new.select(F.col("node").alias("hn"), F.col("lbl").alias("hl"))
        new = (
            new.join(hop.hint("shuffle_hash"), new["lbl"] == hop["hn"], "left")
            .select("node", F.least("lbl", "hl").alias("lbl"), "own")
            .repartition(loop_parts, "node")
            .localCheckpoint(eager=True)
        )
        mark(f"round {it} ckpt")
        changed = new.filter(F.col("lbl") != F.col("own")).count()
        mark(f"round {it} count changed={changed}")
        labels = new.select("node", "lbl")
        if changed == 0:
            break
    labels.write.format("noop").mode("overwrite").save()
    mark("final noop")
    prev = 0.0
    if rep == 2:
        for label, t in marks:
            print(f"  {t - prev:6.3f}s  {label}")
            prev = t
        print(f"  total {marks[-1][1]:.3f}s")
    # release checkpoints
    it2 = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it2.hasNext():
        it2.next()._2().unpersist(True)

spark.stop()
