#!/usr/bin/env python
"""One-off r20: bisect the allpairs first-run cliff — time each pipeline
piece's FIRST execution in a fresh warmed session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_processing_spark.queries import QUERIES
from flink_stream_processing_spark.session import get_spark
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_cliff2")
spark.sparkContext.setLogLevel("ERROR")
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
for t in ("documents",):
    spark.read.parquet(f"{sf}/{t}.parquet").write.mode("overwrite").format("noop").save()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: {time.perf_counter()-t0:.3f}s", flush=True)


from fractions import Fraction

from flink_stream_processing_spark.operators.setsim import (
    _hashed_shingle_arrays,
    _rare_first_prefix,
)

docs = spark.read.parquet(f"{sf}/documents.parquet")
frac = Fraction(0.6).limit_denominator(1_000_000)
num, den = frac.numerator, frac.denominator
par = spark.sparkContext.defaultParallelism

t("1 shingle arrays (ckpt)", lambda: _hashed_shingle_arrays(docs, "text", "doc_id", 3))
arr = _hashed_shingle_arrays(docs, "text", "doc_id", 3)
res = {}
t("2 prefix build", lambda: res.update(zip(("postings", "prefix"), _rare_first_prefix(arr, "doc_id", num, den, 100_000, par))) or noop(res["prefix"]))
prefix = res["prefix"]
a = prefix.select(F.col("doc_id").alias("pid_a"), F.col("sz").alias("sz_a"), "sh_h")
b = prefix.select(F.col("doc_id").alias("pid_b"), F.col("sz").alias("sz_b"), "sh_h")
cand = (
    a.join(b, "sh_h")
    .filter(F.col("pid_a") < F.col("pid_b"))
    .filter(F.least("sz_a", "sz_b") * F.lit(den) >= F.greatest("sz_a", "sz_b") * F.lit(num))
    .select(F.col("pid_a").alias("id_a"), F.col("pid_b").alias("id_b"))
    .distinct()
)
t("3 cand join", lambda: noop(cand))
print("   cand rows:", cand.count())
ha = arr.select(F.col("doc_id").alias("id_a"), F.col("shh").alias("h_a"))
hb = arr.select(F.col("doc_id").alias("id_b"), F.col("shh").alias("h_b"))
hinter = F.size(F.array_intersect("h_a", "h_b"))
hunion = F.size("h_a") + F.size("h_b") - hinter
survivors = (
    cand.repartition(par, "id_a")
    .join(ha, "id_a")
    .join(hb, "id_b")
    .filter(hinter * F.lit(den) >= hunion * F.lit(num))
    .select("id_a", "id_b")
)
t("4 stage1 prefilter", lambda: noop(survivors))
print("   survivors:", survivors.count())
sa = arr.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
sb = arr.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
inter = F.size(F.array_intersect("sh_a", "sh_b"))
union = F.size("sh_a") + F.size("sh_b") - inter
final = (
    survivors.join(sa, "id_a")
    .join(sb, "id_b")
    .filter(inter * F.lit(den) >= union * F.lit(num))
    .select("id_a", "id_b", F.round(inter / union, 5).alias("jaccard"))
)
t("5 stage2 exact", lambda: noop(final))
t("6 FULL again", lambda: QUERIES["allpairs_jaccard_join"](spark, sf).collect())
t("7 FULL again", lambda: QUERIES["allpairs_jaccard_join"](spark, sf).collect())
spark.stop()
