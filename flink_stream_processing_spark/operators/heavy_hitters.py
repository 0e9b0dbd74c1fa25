"""Mergeable heavy-hitters summary (deterministic Misra–Gries) — the
frequency-sketch family's bounded-state member (r18 library capability,
post-saturation policy: no registry entry; laws + hypothesis sweep +
in-suite DuckDB oracle + scale rung).

The registered `count_min_sketch_tokens` answers point-frequency probes
with a RANDOMIZED overestimate; this module is the complementary
DETERMINISTIC summary: at most k (key, est) counters with the classic
Misra–Gries guarantee (Misra & Gries, "Finding repeated elements",
Science of Computer Programming 2, 1982)

    0  <=  true(key) - est(key)  <=  err_bound  <=  N / (k + 1)

for EVERY key (absent keys read est = 0), so every key with true count
above N/(k+1) is guaranteed present — the φ-heavy-hitter completeness a
curation pipeline needs for "which tokens/hosts/licenses dominate this
corpus" questions with an auditable error certificate, in k rows of
state regardless of corpus size.

The summaries are MERGEABLE (Agarwal, Cormode, Huang, Phillips, Wei &
Yi, "Mergeable summaries", PODS 2012, §3): sum counters keyed on the
key, re-prune to k, and the SAME εN bound holds over the union — shards
and days summarize independently and the corpus is never re-scanned,
exactly the HLL-max / bloom-or / histogram-add / reservoir-merge
maintenance story one module over.

DETERMINISM (what makes every law exact): instead of the textbook
order-dependent counter eviction, the prune is the closed-form OFFSET
form — δ = the (k+1)-th largest count (0 if ≤ k distinct), subtract δ
from every counter, drop the non-positive ones. The surviving set is
the "count > δ" keys (≤ k by construction), the removed mass is
≥ δ·(k+1) (ranks s+1..k+1 all carry exactly δ), which is the classic
amortization that yields Σδ ≤ N/(k+1) through any merge tree, and δ
depends only on the COUNT MULTISET — no tie-break ambiguity, so Spark
and DuckDB produce bit-identical states and merge is exactly
commutative/associative as frames.

State: `MGState(counters, meta)` — counters (key, est) ≤ k narrow rows;
meta a SINGLE row (n_total, err_bound) carrying the summarized mass and
the cumulative pruned offset Σδ (a per-state bound TIGHTER than
N/(k+1), law-pinned on both sides). The meta row rides the same
broadcast-scalar convention as the package's other single-row frames.

100 TB design: the build is ONE map-side-combined groupBy over the
shard (the same shape as any token count — the scan you were already
paying), immediately collapsed to k rows + 1 meta row; the prune's
(k+1)-th-largest is TakeOrderedAndProject (per-partition heaps, never a
global sort — plan-pinned) and the offset subtraction broadcasts the
single δ row. Merges touch O(k) rows, ever.

LAWS (test-pinned in tests/test_heavy_hitters.py, swept by hypothesis
against exact Python counts):
- sandwich: true - err_bound <= est <= true for counter keys; absent
  keys have true <= err_bound;
- certificate: err_bound == Σδ exactly, and err_bound <= N/(k+1);
- bounded state: counters never exceed k rows after build or any merge;
- lossless small case: ≤ k distinct keys => est == true and
  err_bound == 0, preserved by merge while the union stays ≤ k;
- merge commutativity: merge(a, b) == merge(b, a) bit-identically;
- φ-completeness: every key with true > φ·N (φ >= 1/(k+1)) appears in
  mg_heavy_hitters(state, φ);
- stream ≡ batch guarantee: folding mg_merge over micro-batches keeps
  every law vs the batch-exact counts (and is bit-equal to the batch
  summary when lossless).

Reference parity note: the reference (StreamJob.java) keeps no
frequency state at all — this belongs to the LLM-pipeline extension's
corpus-analytics arc.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default counter budget. Production sizes k from the target error
# (k ≈ 1/ε - 1); the arithmetic is identical, only the literal changes.
_MG_K = 64


class MGState(NamedTuple):
    counters: DataFrame  # (key string, est long) — at most k rows
    meta: DataFrame  # single row (n_total long, err_bound long)


def _pruned(counts: DataFrame, key_col: str, k: int):
    """Offset-prune exact (key, n) counts to ≤ k counters. δ = the
    (k+1)-th largest count (0 when ≤ k distinct): TakeOrdered k+1 rows,
    min over them — deterministic because ties make the top-(k+1) COUNT
    multiset unique even when the key set is not. Returns
    (counters, delta_frame[single row (d)])."""
    top = counts.orderBy(F.desc("n"), key_col).limit(k + 1)
    delta = top.agg(
        F.coalesce(
            F.when(F.count(F.lit(1)) == k + 1, F.min("n")), F.lit(0)
        )
        .cast("long")
        .alias("d")
    )
    counters = (
        counts.crossJoin(F.broadcast(delta))
        .select(key_col, (F.col("n") - F.col("d")).cast("long").alias("est"))
        .filter(F.col("est") > 0)
    )
    return counters, delta


def mg_build(
    items: DataFrame,
    key_col: str = "key",
    k: int = _MG_K,
    weight_col: str | None = None,
) -> MGState:
    """Summarize a key stream: exact map-side-combined counts (the one
    corpus scan), offset-pruned to ≤ k counters, with the meta row
    recording the summarized mass and the pruned offset.

    ``weight_col`` switches occurrence counting to POSITIVE-INTEGER
    weight sums (bytes per host, tokens per license, …): every
    guarantee holds verbatim with N = total weight, because the prune's
    mass amortization argues over the aggregated count multiset and
    never looks at row multiplicity. Negative or fractional weights are
    the caller's error (they break the amortization / long arithmetic
    respectively — same positive-weight contract as ares_keyed)."""
    w = F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    counts = items.groupBy(key_col).agg(w.cast("long").alias("n"))
    counters, delta = _pruned(counts, key_col, k)
    meta = (
        items.agg(F.coalesce(w, F.lit(0)).cast("long").alias("n_total"))
        .crossJoin(F.broadcast(delta))
        .select("n_total", F.col("d").alias("err_bound"))
    )
    return MGState(counters=counters, meta=meta)


def mg_merge(a: MGState, b: MGState, key_col: str = "key", k: int = _MG_K) -> MGState:
    """Merge two summaries: sum counters on the key (full outer — a key
    novel to one side enters at its other-side estimate), re-prune to k,
    accumulate n_total and err_bound (+ the re-prune's own δ). The
    mergeable-summaries theorem keeps err_bound ≤ N_total/(k+1) through
    any merge tree. O(k) rows touched; never re-scans any corpus."""
    summed = (
        a.counters.select(key_col, F.col("est").alias("ea"))
        .join(
            b.counters.select(key_col, F.col("est").alias("eb")),
            key_col,
            "full_outer",
        )
        .select(
            key_col,
            (F.coalesce("ea", F.lit(0)) + F.coalesce("eb", F.lit(0)))
            .cast("long")
            .alias("n"),
        )
    )
    counters, delta = _pruned(summed, key_col, k)
    am = a.meta.select(
        F.col("n_total").alias("na"), F.col("err_bound").alias("ba")
    )
    bm = b.meta.select(
        F.col("n_total").alias("nb"), F.col("err_bound").alias("bb")
    )
    meta = (
        am.crossJoin(F.broadcast(bm))
        .crossJoin(F.broadcast(delta))
        .select(
            (F.col("na") + F.col("nb")).cast("long").alias("n_total"),
            (F.col("ba") + F.col("bb") + F.col("d"))
            .cast("long")
            .alias("err_bound"),
        )
    )
    return MGState(counters=counters, meta=meta)


def mg_heavy_hitters(state: MGState, phi: float, key_col: str = "key") -> DataFrame:
    """Keys whose TRUE count may exceed φ·N: est + err_bound > φ·n_total.
    COMPLETE (no false negatives): true ≤ est + err_bound for every key,
    so every genuinely φ-heavy key passes the filter; a key absent from
    the counters has true ≤ err_bound and cannot be φ-heavy once
    φ·N > err_bound (i.e. any φ ≥ 1/(k+1) once N > 0). Output:
    (key, est, floor(φN) as threshold), ordered by est desc."""
    return (
        state.counters.crossJoin(F.broadcast(state.meta))
        .filter(
            F.col("est") + F.col("err_bound") > F.lit(phi) * F.col("n_total")
        )
        .select(
            key_col,
            "est",
            F.floor(F.lit(phi) * F.col("n_total")).cast("long").alias("threshold"),
        )
        .orderBy(F.desc("est"), key_col)
    )


# --- in-suite DuckDB oracle (post-saturation policy item 1) -----------------
# The deterministic offset-prune is fully SQL-expressible, so the token
# summary over the documents table gets the same driver-equivalent gate
# as a registered query (tests/test_heavy_hitters.py), without a
# registry row. Token convention = tokens_col / string_split_regex — the
# package-wide whitespace contract.

MG_TOKENS_K = 16

MG_TOKENS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS key
  FROM documents
), counts AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY key
), ranked AS (
  SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS r FROM counts
), delta AS (
  SELECT CASE WHEN (SELECT count(*) FROM counts) > {MG_TOKENS_K}
              THEN (SELECT n FROM ranked WHERE r = {MG_TOKENS_K} + 1)
              ELSE 0 END AS d
)
SELECT key, CAST(n - d AS BIGINT) AS est
FROM counts, delta
WHERE n - d > 0
ORDER BY est DESC, key
"""
