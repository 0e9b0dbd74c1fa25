"""Mergeable Bloom-filter state — the persisted pre-filter of the
incremental dedup pipeline (r17 library capability, post-saturation
policy: no registry entry; laws + hypothesis sweep + scale rung).

The registered query (`analytics_graph2.q_bloom_filter_membership`) is a
one-shot membership REPORT; this module is the STORE form: a sparse
packed bitmap a daily pipeline persists between runs so tomorrow's
ingest can probe "possibly seen before?" without touching the key store
at all. The Bloom filter is the textbook structure (Bloom, CACM 1970);
the maintenance story mirrors the HLL register-max family one module
over — its merge is LOSSLESS, so shards never need re-scanning:

    bits(A ∪ B) == merge(bits(A), bits(B))        (bit-identical, exact)

State representation: SPARSE (word_idx, word) rows over an m-bit space
packed 64 bits per long — at most min(k·n, m/64) rows regardless of
corpus size, and the all-zero words that dominate an underfilled filter
are never materialized. Merge is one keyed BIT_OR aggregate; probe
broadcasts the O(m/64) state into the probe scan, so the probe side
NEVER shuffles (the join-pruning shape every sketch here uses).

Hashing: k independent bit positions per key via xxhash64(key, j) — the
production-scale JVM hash (the simhash xxhash64 precedent), exact and
engine-deterministic, so every law below is testable bit-for-bit.

LAWS (test-pinned in tests/test_bloom.py):
- lossless merge: sharded build == single-pass build, bit-identical;
- no false negatives: every inserted key probes positive (exact — the
  Bloom guarantee);
- merge idempotence/commutativity: merge(s, s) == s, merge(a, b) ==
  merge(b, a);
- monotonicity: a merge never clears a bit (popcount non-decreasing);
- measured FPR on planted disjoint negatives within the closed-form
  (1 - e^{-kn/m})^k envelope (generous ceiling — the estimate itself
  is asymptotic).

Reference parity note: the reference (StreamJob.java) keeps no persisted
state at all — this belongs to the LLM-pipeline extension's
incremental-dedup arc (the `store_maintenance` family's admission
pre-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Defaults sized for the fixture corpora; production picks m from the
# target FPR (m ≈ -n·ln(p)/ln(2)², k ≈ (m/n)·ln(2)) — the arithmetic is
# identical, only the literals change.
_BLOOM_M = 1 << 16  # bits
_BLOOM_K = 5  # hashes per key


def _positions(key_col, m: int, k: int):
    """The k bit positions of one key: xxhash64(key, j) mod m, j < k.
    Returns the exploded (j, pos) pair columns' select list."""
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    return j, (F.pmod(F.xxhash64(key_col, F.col("j")), F.lit(m))).alias("pos")


def bloom_bits(
    keys: DataFrame, key_col: str = "key", m: int = _BLOOM_M, k: int = _BLOOM_K
) -> DataFrame:
    """Build the sparse bitmap state (word_idx, word) from a key frame.
    One narrow explode (k rows per key) into one BIT_OR aggregate keyed
    on word_idx — partial map-side, ≤ m/64 output rows. Duplicate keys
    are free (OR is idempotent), so no distinct is spent on the input."""
    j, pos = _positions(F.col(key_col), m, k)
    return (
        keys.select(F.col(key_col), j)
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two states: one keyed BIT_OR over the concatenated sparse
    rows. LOSSLESS (law-pinned): merging shard states is bit-identical
    to a single-pass build over the union of their keys — at 100 TB,
    shards build independently and the store is never re-scanned."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    state: DataFrame,
    key_col: str = "key",
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
) -> DataFrame:
    """Membership verdict per probe key: positive iff ALL k bits are set.
    The O(m/64) state is BROADCAST into the probe side's explode — the
    probe scan never shuffles on key; a word absent from the sparse
    state is an all-zero word (left join + coalesce 0). Output:
    (key, bloom_positive), one row per distinct probe key. The verdict
    aggregates with boolean AND (min), not a hit COUNT — two of a key's
    k hashes can collide onto one bit position, and counting distinct
    hits against k would turn that collision into a false negative,
    breaking the Bloom guarantee."""
    j, pos = _positions(F.col(key_col), m, k)
    probe_bits = (
        probes.select(F.col(key_col), j)
        .select(F.col(key_col), pos)
        .select(
            key_col,
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
    )
    return (
        probe_bits.join(F.broadcast(state), "word_idx", "left")
        .select(
            key_col,
            (
                F.col("bit").bitwiseAND(
                    F.coalesce(F.col("word"), F.lit(0).cast("long"))
                )
                != 0
            ).alias("hit"),
        )
        .groupBy(key_col)
        .agg(F.min("hit").alias("bloom_positive"))
    )


def bloom_popcount(state: DataFrame) -> DataFrame:
    """Single-row (n_set_bits, n_words) diagnostic — the monotonicity
    law's observable, and the input to the standard fill-ratio FPR
    estimate."""
    return state.agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_set_bits"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
