"""Mergeable counting Bloom filter — the DELETE-capable member of the
admission-screen family (r19 library capability, post-saturation policy:
no registry entry; laws + hypothesis sweep + in-suite DuckDB oracle for
the md5 twin + scale rung).

`operators/bloom.py` is the plain bitmap: lossless shard merge, O(m/64)
broadcastable state — but it CANNOT delete (clearing a bit would break
every other key that hashes onto it), so the daily cycle documents two
costs a takedown leaves behind: a purged doc stays screen-positive
forever (its re-ingest pays the exact confirm instead of the fast path)
and bitmap hygiene needs a periodic `rebuild_bloom` full re-derive.
The counting form (Fan, Cao, Almeida & Broder, "Summary cache: a
scalable wide-area web cache sharing protocol", IEEE/ACM ToN 2000, §4)
replaces each bit with a counter:

    insert  = +1 on each of the key's k positions
    delete  = -1 on the same positions
    member  = all k positions have count > 0

so the state is a plain ADDITIVE group: shard builds merge by keyed sum
(lossless, exactly like the bitmap's BIT_OR), and a membership-closed
delete is an EXACT inverse — the N-day cycle with takedowns keeps the
screen bit-for-bit equal to a from-scratch build over the survivors,
no rebuild pass, no stale positives (law-pinned in
tests/test_daily_cycle.py via the `screen="cbf"` cycle variant).

State representation: SPARSE (pos, n) rows over the m-position space —
at most min(k·n, m) rows; untouched positions are never materialized.
Counters are per-POSITION, not per-word: a counter needs the full long
anyway, and the sparse row count is what bounds the broadcast, not the
packing. The probe broadcasts the state into the probe scan exactly as
`bloom_probe` does (probe side never shuffles); `cbf_to_bits` packs the
positive positions into the bitmap schema, pinning cross-family
agreement (bit-identical to `bloom_bits` over the same key multiset...
after dedup — see the contract below).

CONTRACT (what makes delete exact): the filter summarizes a key SET —
insert each member once, delete each removed member once (the daily
cycle's novel-fingerprint / removed-fingerprint frames are exactly such
sets). Re-inserting a present key or deleting an absent one is the
caller's error; the state stays well-defined (it is just a multiset
counter) but set-membership semantics and the bitmap-agreement law
assume set discipline. A NEGATIVE counter is impossible under the
contract and is kept VISIBLE in the state rather than clamped (the
same over-decrement observability rule as the span refcount store).

Hashing: identical position function to `bloom.py` — xxhash64(key, j)
mod m for j < k (production default, engine-deterministic), with the
package's standard md5 TWIN (`hash_fn="md5"`) whose positions DuckDB
can recompute exactly — conv(md5(key || '#' || j)[:8]) mod m — giving
the counter state a bit-identical cross-engine oracle
(tests/test_cbf.py), the simhash md5-twin precedent.

LAWS (test-pinned in tests/test_cbf.py, swept by hypothesis against an
exact Python Counter model):
- lossless merge: cbf_merge(cbf(A), cbf(B)) == cbf(A ⊎ B) exactly;
  commutative bit-for-bit;
- exact inverse: cbf_remove(cbf(A ∪ B), B) == cbf(A) for disjoint A, B
  — counter-identical, not just probe-equivalent;
- no false negatives: every inserted key probes positive;
- bitmap agreement: cbf_to_bits(cbf(S)) == bloom_bits(S) bit-identical
  and probe verdicts agree on every probe key;
- membership-closed removal never yields a negative counter; planted
  non-member removal IS visible as one (the observability law);
- DuckDB oracle: md5-twin counter state bit-identical cross-engine.

Reference parity note: the reference (StreamJob.java) keeps no persisted
state at all — this belongs to the LLM-pipeline extension's
incremental-dedup arc (the takedown-aware admission screen the
daily-cycle composition needs at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import _BLOOM_K, _BLOOM_M


def _cbf_positions(key_col, m: int, k: int, hash_fn: str):
    """The k positions of one key, exploded: (j, pos). ``hash_fn``:
    'xxhash64' (production JVM hash) or 'md5' (the DuckDB-twin:
    conv(first 8 hex chars of md5(key || '#' || j)) mod m — '#' keeps
    (key='a', j=11) and (key='a1', j=1) from colliding by
    concatenation)."""
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    if hash_fn == "xxhash64":
        pos = F.pmod(F.xxhash64(key_col, F.col("j")), F.lit(m)).alias("pos")
    elif hash_fn == "md5":
        pos = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(key_col, F.lit("#"), F.col("j").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ).alias("pos")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return j, pos


def cbf_counts(
    keys: DataFrame,
    key_col: str = "key",
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the sparse counter state (pos, n) from a key-SET frame. One
    narrow explode (k rows per key) into one map-side-combined count
    keyed on pos — ≤ min(k·|keys|, m) output rows. Unlike `bloom_bits`,
    input multiplicity COUNTS (the additive group is what makes delete
    exact), so the caller supplies each member exactly once."""
    j, pos = _cbf_positions(F.col(key_col), m, k, hash_fn)
    return (
        keys.select(F.col(key_col), j)
        .select(pos)
        .groupBy("pos")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cbf_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two states: one keyed SUM over the concatenated sparse rows.
    LOSSLESS and exact (law-pinned): shards build independently and the
    store is never re-scanned — the bitmap family's maintenance story
    with + in place of OR."""
    return (
        a.unionByName(b)
        .groupBy("pos")
        .agg(F.sum("n").cast("long").alias("n"))
        .filter(F.col("n") != 0)
    )


def cbf_remove(
    state: DataFrame,
    removed: DataFrame,
    key_col: str = "key",
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Delete a key set: merge the NEGATED counts of the removed keys.
    Under the membership-closed contract this is the exact inverse of
    the keys' insertion — the result is counter-identical to a build
    that never saw them. Zero rows drop out (the sparse invariant);
    negative counters are KEPT so a contract violation (removing a
    never-inserted key) stays observable in the state, mirroring the
    span refcount store's over-decrement rule."""
    neg = cbf_counts(removed, key_col, m, k, hash_fn).select(
        "pos", (-F.col("n")).alias("n")
    )
    return cbf_merge(state, neg)


def cbf_probe(
    probes: DataFrame,
    state: DataFrame,
    key_col: str = "key",
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Membership verdict per probe key: positive iff ALL k positions
    hold n > 0. The O(rows) state is BROADCAST into the probe side's
    explode — the probe scan never shuffles on key (bloom_probe's
    join-pruning shape). Verdict aggregates with boolean AND (min): two
    of a key's k hashes can collide onto one position, and that must
    not manufacture a false negative. Output: (key, cbf_positive), one
    row per distinct probe key."""
    j, pos = _cbf_positions(F.col(key_col), m, k, hash_fn)
    probe_pos = probes.select(F.col(key_col), j).select(F.col(key_col), pos)
    return (
        probe_pos.join(F.broadcast(state), "pos", "left")
        .select(
            key_col,
            (F.coalesce(F.col("n"), F.lit(0).cast("long")) > 0).alias("hit"),
        )
        .groupBy(key_col)
        .agg(F.min("hit").alias("cbf_positive"))
    )


def cbf_to_bits(state: DataFrame) -> DataFrame:
    """Project the counter state onto the bitmap schema (word_idx, word):
    positions with n > 0 pack 64 per long. Bit-identical to
    `bloom_bits` over the same key set when built with the same
    (m, k, xxhash64) — the cross-family agreement law — so a pipeline
    can hand a CBF-maintained screen to any bitmap consumer
    (bloom_probe, bloom_popcount) without a rebuild."""
    return (
        state.filter(F.col("n") > 0)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def cbf_summary(state: DataFrame) -> DataFrame:
    """Single-row diagnostic (n_positive, n_negative, n_total_count):
    the fill observable for FPR sizing plus the contract-violation
    observable (n_negative > 0 ⟺ a non-member was removed)."""
    return state.agg(
        F.coalesce(
            F.sum(F.when(F.col("n") > 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_positive"),
        F.coalesce(
            F.sum(F.when(F.col("n") < 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_negative"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_total_count"),
    )


# --- in-suite DuckDB oracle (post-saturation policy item 1) -----------------
# The md5-twin position function is fully SQL-expressible, so the counter
# state over the documents fingerprint set gets the driver-equivalent
# bit-identical gate (tests/test_cbf.py) without a registry row. The
# fingerprint set matches the daily cycle's admission key convention.

CBF_ORACLE_M = 1 << 12
CBF_ORACLE_K = 3

CBF_FP_ORACLE = f"""
WITH fps AS (
  SELECT DISTINCT md5(lower(trim(text))) AS key FROM documents
), pos AS (
  SELECT CAST(
           CAST(('0x' || substring(md5(key || '#' || CAST(j AS VARCHAR)), 1, 8))
                AS BIGINT) % {CBF_ORACLE_M} AS BIGINT
         ) AS pos
  FROM fps, unnest(range(0, {CBF_ORACLE_K})) AS t(j)
)
SELECT pos, CAST(count(*) AS BIGINT) AS n
FROM pos GROUP BY pos
ORDER BY pos
"""
