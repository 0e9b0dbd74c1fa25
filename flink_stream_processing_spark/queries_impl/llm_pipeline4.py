"""Round-4 LLM-pipeline additions.

``greedy_pack_bins``: capacity-constrained greedy document packing — the
OTHER standard pretraining packing besides concat-then-chunk
(``sequence_packing``): documents never straddle context windows; a doc
that would overflow the current bin opens a new one. The recurrence
(fill/bin depend on every earlier doc) is inherently sequential, so it
cannot be a window function — this is exactly the applyInPandas use case:
shard the corpus deterministically, run the sequential fold per shard, one
Arrow batch per shard.

Scale design (100 TB): shards are independent — parallelism = shard count
(set it to O(cluster cores); the md5 shard hash balances load). Each task
holds ONE shard's (doc_id, n_tokens) pairs — two small columns, not text —
so even million-doc shards are a few MB of Arrow. The oracle replays the
same fold as a recursive CTE, certifying the per-shard sequential
semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table

_PACK_CAP = 256
_N_SHARDS = 8

_GREEDY_PACK_ORACLE = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS n_tokens,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_N_SHARDS} AS shard
  FROM documents
), b AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM t
), rec AS (
  SELECT shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS fill_after
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.shard, b.doc_id, b.n_tokens, b.rn,
         CASE WHEN r.fill_after + b.n_tokens > {_PACK_CAP}
              THEN r.bin_idx + 1 ELSE r.bin_idx END,
         CASE WHEN r.fill_after + b.n_tokens > {_PACK_CAP}
              THEN b.n_tokens ELSE r.fill_after + b.n_tokens END
  FROM b JOIN rec r ON b.shard = r.shard AND b.rn = r.rn + 1
)
SELECT doc_id, shard, bin_idx, fill_after
FROM rec ORDER BY shard, doc_id
"""


def _pack_shard(pdf):
    """Sequential greedy fold over one shard, docs in doc_id order."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    bins, fills = [], []
    fill, bin_idx = 0, 0
    for n in pdf["n_tokens"]:
        if fill > 0 and fill + n > _PACK_CAP:
            bin_idx += 1
            fill = 0
        fill += n
        bins.append(bin_idx)
        fills.append(fill)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "shard": pdf["shard"].to_numpy(),
            "bin_idx": bins,
            "fill_after": fills,
        }
    )


@query("greedy_pack_bins", oracle=_GREEDY_PACK_ORACLE)
def q_greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard greedy bin packing (capacity ``_PACK_CAP``, ``_N_SHARDS``
    md5-hash shards): no document straddles a context window.
    groupBy(shard).applyInPandas runs the sequential fold where it belongs
    — inside one task per shard — while the shard split keeps the whole
    corpus parallel."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    )
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("long")
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", n_tokens.alias("n_tokens"), shard.alias("shard")
    )
    out = t.groupBy("shard").applyInPandas(
        _pack_shard, "doc_id long, shard long, bin_idx long, fill_after long"
    )
    return out.orderBy("shard", "doc_id")


# --- Domain frequency capping (r5) -----------------------------------------
# The C4/CCNet/Dolma-style mix-balancing op: no source (domain) may
# contribute more than CAP documents; when over cap, keep the BEST ones
# (quality proxy, deterministic tie-break), never a random subset — this is
# capping, not sampling (fixed_quota_sample is the seeded-random cousin).

_DOMAIN_CAP = 20

_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
         AS BIGINT) AS chars_kept
FROM ranked
GROUP BY source
ORDER BY source
"""


@query("domain_frequency_cap", oracle=_DOMAIN_CAP_ORACLE)
def q_domain_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency capping: each source keeps at most
    ``_DOMAIN_CAP`` (20) documents, chosen by quality proxy (n_chars desc,
    doc_id tie-break). The implementation is the SKEW-AWARE split a 100 TB corpus
    needs: one map-combined count finds which domains are over cap, docs
    in under-cap domains PASS THROUGH with no sort at all, and only the
    over-cap domains' partitions pay the rank window — so a web crawl
    where 95% of domains are tiny and a handful are million-doc
    heavy-hitters sorts only the heavy hitters (and those can be salted
    into a two-phase per-domain top-K if a single domain outgrows a
    partition). The oracle ranks everything — same answer, the split is
    invisible."""
    from pyspark.sql.window import Window as _W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    docs_c = docs.join(counts, "source")
    under = docs_c.filter(F.col("n_docs") <= _DOMAIN_CAP).withColumn(
        "kept", F.lit(True)
    )
    wq = _W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    over = (
        docs_c.filter(F.col("n_docs") > _DOMAIN_CAP)
        .withColumn("rk", F.row_number().over(wq))
        .withColumn("kept", F.col("rk") <= _DOMAIN_CAP)
        .drop("rk")
    )
    return (
        under.unionByName(over)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("chars_kept"),
        )
        .orderBy("source")
    )
