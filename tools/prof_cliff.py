#!/usr/bin/env python
"""One-off r20: quantify the first-run cliff on allpairs/pq/containment in a
fresh session with the bench warmup, then repeats. Optional env:
CLIFF_CONF='k=v;k=v' extra spark conf."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
extra = {}
for kv in os.environ.get("CLIFF_CONF", "").split(";"):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra[k] = v
spark = get_spark(app_name="prof_cliff", extra_conf=extra or None)
spark.sparkContext.setLogLevel("ERROR")

# bench.py warmup replica
QUERIES["window_metrics"](spark, sf).collect()
spark.range(1000).mapInPandas(lambda it: it, "id long").collect()
_a = spark.range(0, 3_000_000).select((F.col("id") % 100_000).alias("k"), F.col("id").alias("v"))
_b = spark.range(0, 1_000_000).select((F.col("id") % 100_000).alias("k"), (F.col("id") * 2).alias("w"))
_a.join(_b, "k").groupBy("k").agg(F.sum("v"), F.max("w")).write.format("noop").mode("overwrite").save()
from pyspark.sql.window import Window as _W

spark.range(0, 1_000_000).select(
    (F.col("id") % 1000).alias("k"), F.md5(F.col("id").cast("string")).alias("h")
).withColumn("rn", F.row_number().over(_W.partitionBy("k").orderBy("h"))).write.format("noop").mode("overwrite").save()
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
for t in ("lineitem", "orders", "documents", "embeddings", "events"):
    try:
        spark.read.parquet(f"{sf}/{t}.parquet").write.mode("overwrite").format("noop").save()
    except Exception:
        pass


if os.environ.get("CLIFF_WARM_HOF"):
    t0 = time.perf_counter()
    arrs = spark.range(0, 150_000).select(
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 40 + 20).cast("int")),
            lambda i: F.xxhash64(F.concat(F.lit("w"), (i * (F.col("id") % 97)).cast("string"))),
        ).alias("ha"),
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 37 + 20).cast("int")),
            lambda i: F.concat(F.lit("s"), ((i + 3) * (F.col("id") % 89)).cast("string")),
        ).alias("sa"),
    ).select(
        "ha",
        "sa",
        F.reverse(F.col("ha")).alias("hb"),
        F.reverse(F.col("sa")).alias("sb"),
    )
    kern = arrs.select(
        F.size(F.array_intersect("ha", "hb")).alias("i1"),
        F.size(F.array_intersect("sa", "sb")).alias("i2"),
        F.size(F.array_distinct("ha")).alias("d1"),
        F.aggregate(
            F.zip_with("ha", "hb", lambda x, y: x.bitwiseXOR(y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseXOR(x),
        ).alias("f1"),
        F.size(F.slice("sa", 1, 5)).alias("s1"),
        F.sort_array(F.transform("ha", lambda x: F.struct(x.alias("a")))).getItem(0).alias("m1"),
    )
    kern.groupBy().agg(F.sum("i1"), F.sum("i2"), F.sum("d1"), F.sum("f1"), F.sum("s1")).collect()
    # postings shape: explode -> window df -> collect_list struct ->
    # sort_array -> slice -> explode -> self-join -> intersect verify
    post = (
        spark.range(0, 30_000)
        .select(
            F.col("id").alias("pid"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), (F.col("id") % 30 + 10).cast("int")),
                    lambda i: F.xxhash64((i * (F.col("id") % 701)).cast("string")),
                )
            ).alias("kh"),
        )
        .repartition(32, "kh")
    )
    wdf = F.count(F.lit(1)).over(_W.partitionBy("kh"))
    pre = (
        post.withColumn("df", wdf)
        .groupBy("pid")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "kh"))).alias("ord"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "pid", "sz", F.explode(F.slice("ord", 1, 5)).alias("p")
        )
        .select("pid", "sz", F.col("p.kh").alias("kh"))
    )
    cj = (
        pre.alias("x")
        .join(pre.alias("y"), "kh")
        .filter(F.col("x.pid") < F.col("y.pid"))
        .select(F.col("x.pid").alias("a"), F.col("y.pid").alias("b"))
        .distinct()
    )
    cj.groupBy().count().collect()
    print(f"hof warmup: {time.perf_counter()-t0:.3f}s", flush=True)


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


names = os.environ.get("CLIFF_QUERIES", "allpairs_jaccard_join,pq_adc_topk,containment_join,embedding_near_dup_pairs").split(",")
for name in names:
    for i in range(3):
        pre = pids()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).collect()
        dt = time.perf_counter() - t0
        release(pre)
        print(f"{name} run{i}: {dt:.3f}s", flush=True)
spark.stop()
