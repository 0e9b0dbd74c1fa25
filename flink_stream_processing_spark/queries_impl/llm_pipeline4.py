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
    """Per-shard greedy bin packing (capacity {cap}, {s} md5-hash shards):
    no document straddles a context window. groupBy(shard).applyInPandas
    runs the sequential fold where it belongs — inside one task per shard —
    while the shard split keeps the whole corpus parallel.""".format(
        cap=_PACK_CAP, s=_N_SHARDS
    )
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
