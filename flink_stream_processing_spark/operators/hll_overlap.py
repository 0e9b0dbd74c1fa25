"""Corpus-overlap estimation from mergeable HLL sketches — set
intersection / containment at sketch cost (r19 library capability,
post-saturation policy: no registry entry; laws + hypothesis sweep with
an error budget derived from the sketch's rsd + scale rung; the
bound-checked oracle follows the registered `approx_distinct_bounds` /
`hll_sketch_merge_bounds` pattern — exact SQL distinct counts + in-bound
flags, since no cross-engine sketch is bit-compatible).

The pipeline question this answers: how much does corpus B overlap
corpus A — a fresh crawl vs the training set, a benchmark vs the corpus
(contamination AT SCALE, the sketch-cost screen in front of the exact
`benchmark_decontamination` path), two crawl snapshots — WITHOUT
shipping or joining the key sets. Estimates come from the
inclusion–exclusion identity over three mergeable estimates
(Dasgupta, Lang, Rhodes & Thaler, "A framework for estimating stream
expression cardinalities", EDBT 2016 discusses exactly this
sketch-composition and its error):

    |A ∩ B|  ≈  est(A) + est(B) − est(A ∪ B)
    containment(B in A) = |A ∩ B| / |B|     jaccard = |A∩B| / |A∪B|

ERROR CONTRACT (part of the API, not a footnote): each HLL estimate
carries relative standard error rse ≈ 1.04/√(2^lg_k); the I–E
difference compounds ABSOLUTE errors, so the intersection's error
budget is ~3·rse·|A ∪ B| — small overlaps of large sets drown in it
(at lg_k=12, rse 1.6%: an intersection under ~5% of the union is
noise). The report carries the budget (`err_budget`) alongside the
estimate so a caller can see when the answer is "too small to
measure with this sketch" instead of trusting a noisy number; the
hypothesis sweep asserts the true intersection lies within the budget,
and the laws pin the anchors (disjoint → ≈0, identical → ≈|A|).

State: the two sides' sketches are ordinary `hll_sketch_agg` binary
columns — mergeable with `hll_union_agg` across shards/days exactly
like the registered merge row, so both sides can be MAINTAINED
incrementally and the overlap report is pure single-row math over
three scalar estimates (no corpus access at report time).

LAWS (test-pinned in tests/test_hll_overlap.py):
- bound: |est_intersection − exact| ≤ err_budget on the fixture pair
  AND on hypothesis-swept random overlap fractions;
- anchors: disjoint sets report ≈0 (within budget); A vs A reports
  ≈|A| and containment ≈1;
- symmetry: intersection(A,B) == intersection(B,A) exactly (the
  estimate, not just the bound — union and sum are symmetric);
- mergeability: sketches built per-shard and unioned give the SAME
  report as single-pass sketches (estimate-identical — HLL union is
  lossless at equal lg_k);
- plan: the report is scalar crossJoins of three single-row aggregates
  (the package convention) — no join of the key sets anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HLL_LGK = 12  # 2^12 registers -> rse ~1.04/2^6 = 1.625%

# the observed-worst constant in the 3-term inclusion-exclusion error
# compound (each term's own deviation is ~rse of ITS cardinality; the
# budget conservatively charges all three against the union)
_IE_ERROR_TERMS = 3.0


def hll_side_sketch(
    keys: DataFrame, key_col: str = "key", lg_k: int = _HLL_LGK
) -> DataFrame:
    """Single-row (sk binary) sketch of one side — build per shard/day
    and fold with `hll_union_agg` (the `hll_sketch_merge_bounds`
    maintenance story); duplicates are free (HLL is a set summary)."""
    return keys.agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sk"))


def hll_sketch_union(sketches: DataFrame) -> DataFrame:
    """Fold a frame of per-shard (sk) rows into one: single-row (sk)."""
    return sketches.agg(F.hll_union_agg("sk").alias("sk"))


def hll_overlap_report(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    lg_k: int = _HLL_LGK,
) -> DataFrame:
    """Single-row overlap report from two single-row side sketches:
    (est_a, est_b, est_union, est_intersection, containment_b_in_a,
    jaccard, err_budget). Pure scalar math over three estimates — the
    key sets are never touched. Intersection is CLAMPED into
    [0, min(est_a, est_b)] (the I–E difference can stray outside the
    feasible range by sketch noise; the raw value's deviation is what
    `err_budget` describes). Division guards: empty sides yield 0
    coefficients, never ANSI divide-by-zero."""
    a = sketch_a.select(F.hll_sketch_estimate("sk").alias("est_a"))
    b = sketch_b.select(F.hll_sketch_estimate("sk").alias("est_b"))
    u = (
        sketch_a.unionByName(sketch_b)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est_union"))
    )
    rse = 1.04 / (2.0 ** (lg_k / 2.0))
    raw = F.col("est_a") + F.col("est_b") - F.col("est_union")
    inter = F.greatest(
        F.lit(0).cast("long"), F.least(raw, F.col("est_a"), F.col("est_b"))
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(u))
        .select(
            "est_a",
            "est_b",
            "est_union",
            inter.cast("long").alias("est_intersection"),
            F.when(
                F.col("est_b") > 0, F.round(inter / F.col("est_b"), 6)
            ).otherwise(F.lit(0.0)).alias("containment_b_in_a"),
            F.when(
                F.col("est_union") > 0, F.round(inter / F.col("est_union"), 6)
            ).otherwise(F.lit(0.0)).alias("jaccard"),
            F.ceil(
                F.lit(_IE_ERROR_TERMS * rse) * F.col("est_union")
            ).cast("long").alias("err_budget"),
        )
    )
