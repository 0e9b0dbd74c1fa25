"""Mergeable weighted-reservoir state (Efraimidis–Spirakis A-Res) — the
shard-merge form of the one-shot `weighted_sample_ares` registry query
(r17 library capability, post-saturation policy: laws + hypothesis
sweep + scale rung, no registry entry).

A 100 TB pipeline that wants a standing weighted sample (inspection
panels, eval subsets, monitoring exemplars) cannot re-rank the corpus
per refresh. A-Res makes the sample a MERGEABLE state: every item gets
the deterministic key -ln(u)/w (u a seeded-md5 uniform, w its weight),
and the weighted sample without replacement of ANY item set is exactly
its k smallest keys. Top-k distributes: the global top-k is the top-k
of shard top-ks, so each shard keeps a k-row reservoir and refreshes
merge in O(shards × k) — the corpus is scanned once per shard, ever.
(Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
IPL 97(5), 2006 — the same estimator the registered query pins
cross-engine.)

Keys are bit-reproducible (seeded md5, the weighted_sample_ares
convention), so every law below is EXACT — no tolerance anywhere:

LAWS (test-pinned in tests/test_sampling.py):
- shard-merge exactness: reservoir(A ∪ B) == merge(res(A), res(B)) for
  any disjoint partitioning, as frames;
- re-presentation idempotence: merging a reservoir with itself (or
  re-presenting already-sampled items) changes nothing — merge dedups
  on the id, which is safe because the key is a pure function of
  (id, weight);
- drift determinism: if the pure-function contract is ever violated
  (same id, different weights across inputs), the merge keeps the
  minimum-(ares_key, …) row per id — deterministic and
  argument-order-independent, never an arbitrary survivor;
- stream ≡ batch: folding reservoir_merge over the micro-batches of a
  file stream (foreachBatch refresh) yields exactly the batch
  reservoir over the same rows;
- prefix property: the k-reservoir is a prefix of the (k+1)-reservoir
  under the (key, id) total order;
- bounded size: a merge output never exceeds k rows.

Scale design: the per-shard reservoir is TakeOrderedAndProject (a
per-partition top-k heap merged on the driver, never a global sort —
the only shape that survives 100 TB for a k-row sample); merge unions
O(shards × k) rows and re-heaps. The state is k narrow rows.

Reference parity note: the reference (StreamJob.java) has no sampling
at all — this belongs to the LLM-pipeline extension's curation arc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ARES_SEED = "ares"


def ares_keyed(
    items: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = _ARES_SEED,
) -> DataFrame:
    """Attach the deterministic A-Res key -ln(u)/w, u = the first 8 md5
    hex chars of (seed || id) as a uniform clamped into (0, 1] —
    byte-identical to the registered weighted_sample_ares query's
    construction, so the two surfaces can never disagree on a sample.
    The raw conv(md5[:8])/2^32 value lives in [0, 1); an id whose md5
    prefix is 00000000 (probability 2^-32) would yield -ln(0) = null,
    and a null key would sort FIRST under Spark's ascending-nulls-first
    default, permanently claiming a reservoir slot regardless of weight
    — so the integer is clamped to >= 1 (u >= 2^-32) in BOTH surfaces
    and the oracle, leaving every other key bit-identical (r17 ADVICE).
    Requires weight > 0 rows (zero/negative weights are the caller's
    filter, same as the query). Output: input columns + ares_key."""
    unif = (
        F.greatest(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("double"),
            F.lit(1.0),
        )
        / F.lit(4294967296.0)
    )
    return items.withColumn(
        "ares_key", F.round(-F.log(unif) / F.col(weight_col), 10)
    )


def weighted_reservoir(
    keyed: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """The k-row weighted sample of a keyed frame: the k smallest
    (ares_key, id) rows — orderBy + limit, which Spark plans as
    TakeOrderedAndProject (per-partition heaps, no global sort). The id
    tiebreak makes the reservoir a pure function of the item set."""
    return keyed.orderBy("ares_key", id_col).limit(k)


def _orderable(dt) -> bool:
    """True iff Spark can ORDER BY a column of this type: maps are
    unorderable, containers are orderable iff their element/field types
    are (mirrors Catalyst's RowOrdering.isOrderable)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def reservoir_merge(
    a: DataFrame, b: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Union two reservoirs and keep the k smallest keys. Dedups on the
    id first — the key is a pure function of (id, weight), so an item
    present in both inputs (a re-presented batch, an overlap between
    shards, merge(s, s)) carries identical rows and survives exactly
    once. The dedup is DETERMINISTIC: per id, keep the row with the
    minimum (ares_key, remaining columns) — so if the same id ever
    arrives with DIFFERENT weights (weight drift between refreshes,
    outside the pure-function contract), the merge still picks one
    well-defined row (the highest-weight/lowest-key one) instead of an
    arbitrary dropDuplicates survivor (r17 ADVICE). Payload columns of
    UNORDERABLE types (maps, or arrays/structs containing them) are
    excluded from the tiebreak rather than raising AnalysisException
    (r18 ADVICE) — the pick stays deterministic through ares_key + the
    orderable columns; rows for one id identical in ALL of those but
    differing inside a map value alone are outside the determinism
    contract (a drift that changes a weight always changes ares_key, so
    the documented weight-drift case is still well-defined). O(|a| +
    |b|) rows touched; never re-scans any corpus."""
    from pyspark.sql import Window

    u = a.unionByName(b)
    order_cols = ["ares_key"] + sorted(
        f.name
        for f in u.schema.fields
        if f.name not in (id_col, "ares_key") and _orderable(f.dataType)
    )
    w = Window.partitionBy(id_col).orderBy(*order_cols)
    dedup = (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return weighted_reservoir(dedup, k, id_col)
