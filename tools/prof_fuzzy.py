#!/usr/bin/env python
"""One-off r20 profiling: where does fuzzy_name_matches_d2 spend its time?
Warm session, noop-sink stage timings for each piece of the d2 pair plan."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_fuzzy")
spark.sparkContext.setLogLevel("ERROR")

# warmup (same recipe as ab_rotate)
QUERIES["window_metrics"](spark, sf).collect()
for t in ("customer", "lineitem", "documents"):
    spark.read.parquet(f"{sf}/{t}.parquet").write.mode("overwrite").format("noop").save()
warm = spark.range(0, 2_000_000)
warm.select((F.col("id") % 1000).alias("k"), F.col("id").alias("v")).groupBy("k").count().write.format("noop").mode("overwrite").save()
spark.range(0, 500_000).select(
    F.md5(F.col("id").cast("string")).alias("h")
).groupBy().agg(F.max("h")).collect()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: min {best:.3f}s", flush=True)
    return best


# full query: collect vs noop
q = QUERIES["fuzzy_name_matches_d2"]
timeit("fuzzy_d2 FULL collect", lambda: q(spark, sf).collect(), reps=3)
timeit("fuzzy_d2 FULL noop", lambda: noop(q(spark, sf)), reps=3)
n = q(spark, sf).count()
print("result rows:", n)

# pieces
from flink_stream_processing_spark.operators.text import _fuzzy_pairs_d2
from flink_stream_processing_spark.operators.parallelism import spread_fanout

cust = spark.read.parquet(f"{sf}/customer.parquet")
subset = cust.filter(F.col("c_custkey") % 3 == 0)
names = subset.select(F.col("c_name").alias("name")).distinct()
print("distinct names:", names.count())

base = spread_fanout(names.filter(F.col("name").isNotNull())).localCheckpoint(eager=True)
timeit("base re-checkpoint", lambda: spread_fanout(names.filter(F.col("name").isNotNull())).localCheckpoint(eager=True).count(), reps=2)

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
k2 = base.select("name", F.explode(F.expr(k2_structs)).alias("s")).select(
    "name", "s.kh", "s.pi", "s.pj", "s.ci", "s.cj"
)
timeit("k2 explode noop (one pass)", lambda: noop(k2), reps=3)
print("k2 rows:", k2.count())

k2u_keys = (
    "IF(length(name) >= 2, array_distinct(flatten("
    "transform(sequence(1, length(name) - 1), "
    "i -> transform(sequence(i + 1, length(name)), j -> "
    "xxhash64(concat(substring(name, 1, i - 1), "
    "substring(name, i + 1, j - i - 1), "
    "substring(name, j + 1, length(name) - j))))))), "
    "array())"
)
k2u = base.select("name", F.explode(F.expr(k2u_keys)).alias("kh")).select("kh", "name")
timeit("k2u explode noop (one pass)", lambda: noop(k2u), reps=3)
print("k2u rows:", k2u.count())

k1_keys = (
    "IF(length(name) >= 1, array_distinct(transform(sequence(1, length(name)), "
    "i -> xxhash64(concat(substring(name, 1, i - 1), "
    "substring(name, i + 1, length(name) - i))))), "
    "array())"
)
k1u = base.select("name", F.explode(F.expr(k1_keys)).alias("kh")).select("kh", "name")
timeit("k1u explode noop", lambda: noop(k1u), reps=3)

# the 2-sub self join alone
a2, b2 = k2.alias("a2"), k2.hint("merge").alias("b2")
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
timeit("c_two_subs noop", lambda: noop(c_two_subs), reps=3)

k0 = base.select(F.xxhash64("name").alias("kh"), "name")
left = k0.unionByName(k1u)
right = k1u.unionByName(k2u)
lft, rgt = left.alias("L"), right.hint("merge").alias("R")
c_plain = lft.join(
    rgt,
    (F.col("L.kh") == F.col("R.kh")) & (F.col("L.name") != F.col("R.name")),
).select(
    F.least(F.col("L.name"), F.col("R.name")).alias("name_a"),
    F.greatest(F.col("L.name"), F.col("R.name")).alias("name_b"),
)
timeit("c_plain noop", lambda: noop(c_plain), reps=3)

cand = c_plain.unionByName(c_two_subs).distinct()
print("cand rows:", cand.count())
full = cand.withColumn("dist", F.levenshtein("name_a", "name_b").cast("long")).filter(
    F.col("dist") <= 2
)
timeit("full pairs noop", lambda: noop(full), reps=3)
timeit("full pairs + sort noop", lambda: noop(full.orderBy("name_a", "name_b")), reps=3)

spark.stop()
