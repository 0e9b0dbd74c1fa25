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
    hex chars of (seed || id) as a uniform in (0, 1] — byte-identical to
    the registered weighted_sample_ares query's construction, so the two
    surfaces can never disagree on a sample. Requires weight > 0 rows
    (zero/negative weights are the caller's filter, same as the query).
    Output: input columns + ares_key."""
    unif = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
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


def reservoir_merge(
    a: DataFrame, b: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Union two reservoirs and keep the k smallest keys. Dedups on the
    id first — the key is a pure function of (id, weight), so an item
    present in both inputs (a re-presented batch, an overlap between
    shards, merge(s, s)) carries identical rows and survives exactly
    once. O(|a| + |b|) rows touched; never re-scans any corpus."""
    return weighted_reservoir(
        a.unionByName(b).dropDuplicates([id_col]), k, id_col
    )
