#!/usr/bin/env python
"""One-off r20: join-strategy A/B for the fuzzy pair joins (merge vs
shuffle_hash) + pre-distinct candidate counts."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_fj")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["window_metrics"](spark, sf).collect()
spark.read.parquet(f"{sf}/customer.parquet").write.mode("overwrite").format("noop").save()
warm = spark.range(0, 2_000_000)
warm.select((F.col("id") % 1000).alias("k"), F.col("id").alias("v")).groupBy("k").count().write.format("noop").mode("overwrite").save()

from flink_stream_processing_spark.operators.parallelism import spread_fanout

cust = spark.read.parquet(f"{sf}/customer.parquet")
subset = cust.filter(F.col("c_custkey") % 3 == 0)
names = subset.select(F.col("c_name").alias("name")).distinct()
base = spread_fanout(names.filter(F.col("name").isNotNull())).localCheckpoint(eager=True)

k2_structs = (
    "IF(length(name) >= 2, flatten(transform(sequence(1, length(name) - 1), "
    "i -> transform(sequence(i + 1, length(name)), j -> "
    "struct(xxhash64(concat(substring(name, 1, i - 1), "
    "substring(name, i + 1, j - i - 1), "
    "substring(name, j + 1, length(name) - j))) AS kh, "
    "i AS pi, j AS pj, "
    "substring(name, i, 1) AS ci, substring(name, j, 1) AS cj)))), "
    "array())"
)
k2u_keys = (
    "IF(length(name) >= 2, array_distinct(flatten("
    "transform(sequence(1, length(name) - 1), "
    "i -> transform(sequence(i + 1, length(name)), j -> "
    "xxhash64(concat(substring(name, 1, i - 1), "
    "substring(name, i + 1, j - i - 1), "
    "substring(name, j + 1, length(name) - j))))))), "
    "array())"
)
k1_keys = (
    "IF(length(name) >= 1, array_distinct(transform(sequence(1, length(name)), "
    "i -> xxhash64(concat(substring(name, 1, i - 1), "
    "substring(name, i + 1, length(name) - i))))), "
    "array())"
)
k2 = base.select("name", F.explode(F.expr(k2_structs)).alias("s")).select(
    "name", "s.kh", "s.pi", "s.pj", "s.ci", "s.cj"
)
k2u = base.select("name", F.explode(F.expr(k2u_keys)).alias("kh")).select("kh", "name")
k1u = base.select("name", F.explode(F.expr(k1_keys)).alias("kh")).select("kh", "name")
k0 = base.select(F.xxhash64("name").alias("kh"), "name")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=4):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: min {best:.3f}s", flush=True)


def build(hint):
    left = k0.unionByName(k1u)
    right = k1u.unionByName(k2u)
    lft = left.alias("L")
    rgt = (right.hint(hint) if hint else right).alias("R")
    c_plain = lft.join(
        rgt,
        (F.col("L.kh") == F.col("R.kh")) & (F.col("L.name") != F.col("R.name")),
    ).select(
        F.least(F.col("L.name"), F.col("R.name")).alias("name_a"),
        F.greatest(F.col("L.name"), F.col("R.name")).alias("name_b"),
    )
    a2 = k2.alias("a2")
    b2 = (k2.hint(hint) if hint else k2).alias("b2")
    c_two_subs = a2.join(
        b2,
        (F.col("a2.kh") == F.col("b2.kh"))
        & (F.col("a2.name") < F.col("b2.name"))
        & (F.col("a2.pi") == F.col("b2.pi"))
        & (F.col("a2.pj") == F.col("b2.pj"))
        & (F.col("a2.ci") != F.col("b2.ci"))
        & (F.col("a2.cj") != F.col("b2.cj")),
    ).select(
        F.least(F.col("a2.name"), F.col("b2.name")).alias("name_a"),
        F.greatest(F.col("a2.name"), F.col("b2.name")).alias("name_b"),
    )
    return c_plain, c_two_subs


for hint in ("merge", "shuffle_hash", None):
    cp, c2 = build(hint)
    tag = hint or "auto"
    timeit(f"c_plain [{tag}] noop", lambda: noop(cp))
    timeit(f"c_two_subs [{tag}] noop", lambda: noop(c2))
    cand = cp.unionByName(c2).distinct()
    full = cand.withColumn("dist", F.levenshtein("name_a", "name_b").cast("long")).filter(F.col("dist") <= 2)
    timeit(f"full pairs [{tag}] noop", lambda: noop(full))

cp, c2 = build("merge")
print("c_plain pre-distinct rows:", cp.count())
print("c_two_subs pre-distinct rows:", c2.count())
spark.stop()
