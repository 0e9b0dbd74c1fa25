"""Data-governance operators: the audit surface a 100 TB training-data
platform runs before (and after) every release.

- ``shard_manifest_integrity``: content-addressed shard manifest — per
  shard, row count, byte totals, and an order-insensitive content
  fingerprint (bit_xor of per-row 60-bit md5 hashes). Re-running the
  manifest after a copy/compaction/migration detects any lost, duplicated,
  or altered row without comparing data: manifests are O(shards), the scan
  is one pass, and xor is partition-order-independent (a shuffle cannot
  change it).
- ``k_anonymity_audit``: quasi-identifier re-identification audit — the
  (nation, segment, balance-bucket) combinations shared by fewer than k
  customers. Groups below k are the re-identifiable rows a release gate
  must suppress or generalize.
- ``dp_noisy_counts``: per-nation order counts with Laplace(1/eps) noise.
  Noise is derived from a SEEDED md5 uniform via inverse-CDF (the repo's
  rand()-free convention), so the release is bit-reproducible and the
  oracle certifies the exact noisy values. A production deployment swaps
  the seed for a secure RNG — the shape (one aggregate, per-group O(1)
  noise, no second scan) is the deployable part.

All three are single-pass aggregations with map-side partials; nothing
wide beyond one keyed shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table

# --- shard manifest -------------------------------------------------------

_MF_SHARDS = 8

_MANIFEST_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, n_chars,
         ('0x' || substr(md5('mf:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_MF_SHARDS} AS shard,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT
           AS row_hash
  FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(bit_xor(row_hash) AS BIGINT) AS content_xor
FROM t GROUP BY shard ORDER BY shard
"""


@query("shard_manifest_integrity", oracle=_MANIFEST_ORACLE)
def q_shard_manifest_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed manifest per md5 shard: row count, char total, and
    the xor-of-row-hashes fingerprint. xor is commutative/associative, so
    the fingerprint is independent of partitioning and row order — the
    property that lets two manifests computed on different clusters (or
    before/after a migration) be compared cell-for-cell."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mf:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _MF_SHARDS
    )
    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "text")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        load_table(spark, sf_dir, "documents")
        .select(shard.alias("shard"), row_hash.alias("row_hash"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.bit_xor("row_hash").cast("bigint").alias("content_xor"),
        )
        .orderBy("shard")
    )


# --- k-anonymity audit ----------------------------------------------------

_KANON_K = 3

_KANON_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       CAST(count(*) AS BIGINT) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < {_KANON_K}
ORDER BY c_nationkey, c_mktsegment, bal_bucket
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier groups below k={k}: each returned combination of
    (nation, market segment, account-balance bucket) identifies fewer than
    k customers — the rows a privacy release gate must generalize or drop.
    One aggregate, HAVING filter evaluated post-partial.""".format(k=_KANON_K)
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .filter(F.col("group_size") < _KANON_K)
        .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")
    )


# --- deterministic DP noisy counts ---------------------------------------

_DP_EPS = 1.0

_DP_ORACLE = f"""
WITH c AS (
  SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS true_count
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
), u AS (
  SELECT nation, true_count,
         ('0x' || substr(md5('dp:' || nation), 1, 8))::BIGINT / 4294967296.0
           AS unif
  FROM c
)
SELECT nation, true_count,
       round(true_count
             - (1.0 / {_DP_EPS})
               * CASE WHEN unif >= 0.5 THEN 1 ELSE -1 END
               * ln(1.0 - 2.0 * abs(unif - 0.5)),
             4) AS noisy_count
FROM u ORDER BY nation
"""


@query("dp_noisy_counts", oracle=_DP_ORACLE)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order counts with Laplace(1/eps={eps}) noise from a
    seeded md5 uniform (inverse-CDF transform) — the differential-privacy
    release shape with the repo's deterministic-noise convention so the
    oracle checks exact values. true_count is emitted for the gate only;
    a real release drops it. Noise is O(1) per output group — cost lives
    entirely in the (unavoidable) count aggregate.""".format(eps=_DP_EPS)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    counts = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_nationkey")), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("nation"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    sign = F.when(unif >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -(1.0 / _DP_EPS) * sign * F.log(F.lit(1.0) - 2.0 * F.abs(unif - 0.5))
    return counts.select(
        "nation",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
    ).orderBy("nation")
