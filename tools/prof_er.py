#!/usr/bin/env python
"""One-off r20 profiling: entity_resolution_clusters{,_d2} time split —
pair generation vs CC loop vs output window/sort/collect."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_er")
spark.sparkContext.setLogLevel("ERROR")

QUERIES["window_metrics"](spark, sf).collect()
for t in ("customer",):
    spark.read.parquet(f"{sf}/{t}.parquet").write.mode("overwrite").format("noop").save()
warm = spark.range(0, 2_000_000)
warm.select((F.col("id") % 1000).alias("k"), F.col("id").alias("v")).groupBy("k").count().write.format("noop").mode("overwrite").save()


def pids():
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(int(it.next()._1()))
    return ids


def release(before):
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        e = it.next()
        if int(e._1()) not in before:
            e._2().unpersist(True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=3):
    best = None
    for _ in range(reps):
        pre = pids()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        release(pre)
        best = dt if best is None else min(best, dt)
    print(f"{label}: min {best:.3f}s", flush=True)
    return best


from flink_stream_processing_spark.operators.dedup import connected_components
from flink_stream_processing_spark.operators.text import fuzzy_name_pairs

cust = spark.read.parquet(f"{sf}/customer.parquet")

for tag, df, d in (("d1-full", cust, 1), ("d2-sub", cust.filter(F.col("c_custkey") % 3 == 0), 2)):
    pairs = fuzzy_name_pairs(df, "c_name", max_dist=d)
    timeit(f"[{tag}] pairs noop", lambda: noop(fuzzy_name_pairs(df, "c_name", max_dist=d)), reps=3)
    idp = pairs.select(
        F.substring("name_a", 10, 9).cast("long").alias("ia"),
        F.substring("name_b", 10, 9).cast("long").alias("ib"),
    )
    n_pairs = idp.count()
    print(f"[{tag}] pairs: {n_pairs}")

    def run_cc():
        p = fuzzy_name_pairs(df, "c_name", max_dist=d).select(
            F.substring("name_a", 10, 9).cast("long").alias("ia"),
            F.substring("name_b", 10, 9).cast("long").alias("ib"),
        )
        connected_components(p, id_a="ia", id_b="ib").write.format("noop").mode("overwrite").save()

    timeit(f"[{tag}] pairs+CC noop", run_cc, reps=3)

name = {1: "entity_resolution_clusters", 2: "entity_resolution_clusters_d2"}
for d, qn in name.items():
    q = QUERIES[qn]
    timeit(f"{qn} FULL collect", lambda: q(spark, sf).collect(), reps=3)
    print(f"{qn} rows:", q(spark, sf).count())

spark.stop()
