"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin family).

The approximate near-dup paths (MinHash+LSH, SimHash — operators/dedup.py)
trade a small recall risk for speed. This operator is their EXACT
counterpart: every pair with word-shingle Jaccard >= threshold is returned,
guaranteed by construction, yet without the O(n²) all-pairs scan — the
classic AllPairs prefix-filter bound (Bayardo et al., "Scaling Up All Pairs
Similarity Search", WWW'07; PPJoin, Xiao et al., VLDB'08).

Construction:
 1. distinct word n-gram shingles per doc (same tokenization as the
    MinHash path, so the two operators are directly comparable);
 2. a GLOBAL canonical ordering of shingles by (document frequency asc,
    shingle asc) — rarest first;
 3. per doc, only the first ``p = s - ceil(t*s) + 1`` shingles (the
    "prefix") generate join candidates. Any pair with Jaccard >= t shares
    at least one prefix shingle: J >= t implies the overlap is >= t*s for
    each side, and a set whose entire overlap sat in its suffix of length
    ceil(t*s) - 1 < t*s would contradict that.
 4. candidates sharing a prefix shingle pass a length filter
    (min(sa,sb) >= t*max(sa,sb), another necessary condition) and are then
    verified in two stages, ending in the EXACT Jaccard on the full
    shingle string arrays.

``ceil(t*s)`` is computed in integer arithmetic from a rational form of the
threshold (Fraction), so no float rounding can shorten a prefix and
silently lose recall.

Scale design (100 TB):
- The only wide exchanges are (a) one shuffle on the shingle key for
  document frequency, and (b) the candidate self-join keyed on PREFIX
  shingles only. Rare-first ordering means frequent shingles never reach
  the join: candidate volume is sum over prefix shingles of df², with df
  small by construction of the prefix.
- Both exchanges are keyed on ``xxhash64(shingle)`` — 8-byte longs — not
  the shingle STRINGS (a 3-word shingle averages ~20 bytes and the
  candidate join materializes it df times per side). A hash collision can
  only merge two shingles' df counts and candidate buckets, i.e. WIDEN the
  candidate set; completeness is untouched (shared shingle => shared hash)
  and precision is restored by the exact string verify, which never enters
  the wide exchanges.
- Document frequency uses a window count over the postings (one shuffle),
  not a groupBy + re-join (two).
- Verify is TWO-STAGE: a hashed-array prefilter over all candidate pairs
  (provable superset of the true pairs under the within-doc-collision
  guard in :func:`_hashed_shingle_arrays`), then the exact string-array
  recompute on the few survivors. Verify joins key on id with NO
  broadcast hint — AQE broadcasts the doc relation while small and
  demotes to a shuffle join at corpus scale (an explicit hint is never
  demoted and becomes a broadcast-OOM).
- The CPU-dense exchanges (hashed postings, candidate pairs) carry tiny
  BYTE volumes, so AQE's size-based coalescing would serialize the
  window/sort/intersect compute behind them (measured: bimodal 3 s / 17 s
  at sf0.1). Explicit ``repartition(defaultParallelism, key)`` counts are
  never coalesced below — deterministic parallelism, sized to cores.
- Skew guard: a shingle whose df exceeds ``max_df`` would generate df²
  candidates; silently truncating it from prefixes would be unsound
  (it can be some doc's only prefix shingle), so the guard fails loudly
  (same contract as dedup._guard_bucket_size) and the operator is re-run
  with a higher threshold or a stopword pre-filter.

Reference tie-in: the reference pipeline (StreamJob.java:36-51) has no
relational dedup at all; this extends the LLM-pipeline dedup family that
SURVEY.md §8 mandates for training-data curation.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_array
from .parallelism import spread_fanout


def _hashed_shingle_arrays(
    docs: DataFrame, text: str, id_col: str, n: int
) -> DataFrame:
    """Materialized per-doc shingle relation ``(id_col, sh, shh)``: ``sh``
    is the distinct shingle STRING array, ``shh`` its xxhash64 image. Every
    wide exchange and the verify prefilter run on the 8-byte ``shh``; the
    strings leave the checkpoint only for the final exact recompute.

    The assert guards the one case that could make the hashed prefilter
    lose a true pair — two DISTINCT shingles of the SAME doc colliding
    (distinct-hash intersection counting could then undercount true
    matches). With it green, every true string match is a distinct hash
    match, so hashed similarity >= true similarity: the prefilter pass is
    a provable SUPERSET and exactness stays unconditional. (~2^-50 odds
    corpus-wide; loud failure, same contract as the max_df guard.)

    Materialized once (localCheckpoint) because it feeds every plan branch
    — prefix build plus both verify sides; without it the text scan +
    shingle construction re-executes per branch (measured 3x the whole
    operator's cost)."""
    return (
        # r19 note: a spread_fanout here was tried and REVERTED — the
        # shingle+hash projection is light enough that the extra exchange
        # lost by kill-switch A/B (containment 3.58 s unspread vs 3.85 s;
        # the heavy per-branch work already re-spreads at the postings
        # explode's explicit repartition).
        shingle_array(docs, text=text, id_col=id_col, n=n)
        .select(id_col, F.array_distinct("sh_arr").alias("sh"))
        .withColumn("shh", F.transform("sh", lambda x: F.xxhash64(x)))
        .withColumn(
            "shh",
            F.when(
                F.assert_true(
                    F.size(F.array_distinct("shh")) == F.size("sh"),
                    F.concat(
                        F.lit("within-doc xxhash64 shingle collision at "),
                        F.col(id_col).cast("string"),
                        F.lit(" — rerun verify on string arrays"),
                    ),
                ).isNull(),
                F.col("shh"),
            ),
        )
        .localCheckpoint(eager=True)
    )


def _rare_first_prefix(
    arr: DataFrame, id_col: str, num: int, den: int, max_df: int, par: int
) -> tuple[DataFrame, DataFrame]:
    """(postings, prefix) under the global rare-first canonical order.

    ``postings`` = (id_col, sh_h), explicitly partitioned ``par`` ways on
    sh_h (deterministic parallelism for the df window — see module doc).
    ``prefix`` = (id_col, sz, sh_h): each doc's first
    ``sz - ceil(num*sz/den) + 1`` keys under the (df asc, hash asc) order —
    prefix length in exact INTEGER arithmetic (`div` is Spark's integral
    division, so the completeness bound cannot be nudged by a double
    rounding boundary). Colliding shingles share one key, so their
    relative order is vacuous and the order stays a global total order on
    KEYS. The per-row assert is the loud df<=max_df skew guard (executor-
    side, no driver collect)."""
    postings = arr.select(id_col, F.explode("shh").alias("sh_h")).repartition(
        par, "sh_h"
    )
    wdf = Window.partitionBy("sh_h")
    with_df = postings.withColumn("df", F.count(F.lit(1)).over(wdf))
    ordered = (
        with_df.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "sh_h"))).alias("ord"),
            F.count(F.lit(1)).alias("sz"),
        )
        .withColumn(
            "prefix_len",
            F.expr(f"sz - (({num}L * sz + {den - 1}L) div {den}L) + 1L"),
        )
    )
    prefix = (
        ordered.select(
            id_col,
            "sz",
            F.explode(
                F.slice(F.col("ord"), 1, F.col("prefix_len").cast("int"))
            ).alias("p"),
        )
        .select(
            id_col,
            "sz",
            F.when(
                F.assert_true(
                    F.col("p.df") <= max_df,
                    F.concat(
                        F.lit(f"prefix shingle over max_df={max_df}: df="),
                        F.col("p.df").cast("string"),
                        F.lit(" — raise the threshold or pre-filter stopword shingles"),
                    ),
                ).isNull(),
                F.col("p.sh_h"),
            ).alias("sh_h"),
        )
    )
    # r19: the groupBy(id) aggregate behind ``ordered`` is AQE-coalesced by
    # its INPUT bytes (~couple MB => 4 post-shuffle partitions), and every
    # verify join downstream is broadcast at bench scale, so the whole
    # candidate-gen + two-stage-verify compute (the O(candidates x array)
    # intersects — 23.8 s CPU measured on allpairs at sf0.1) inherited that
    # 4-task width; the explicit repartition(par, id) before the verify was
    # silently ELIMINATED because the child already carried hash(id)
    # partitioning. Re-spreading the exploded prefix (a few hundred KB)
    # restores core-count parallelism for the entire downstream pipeline
    # (and makes the verify repartition a real exchange again); the gate in
    # spread_fanout keeps it a no-op at corpus scale.
    return postings, spread_fanout(prefix)


def allpairs_jaccard_join(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    max_df: int = 100_000,
) -> DataFrame:
    """All pairs with exact shingle-Jaccard >= ``threshold`` as
    (id_a, id_b, jaccard), id_a < id_b. Exact: recall and precision are 1.0
    by construction (prefix filter is a proven-complete candidate bound;
    the two-stage verify ends in a true-Jaccard recompute on the string
    arrays for every emitted pair)."""
    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    par = docs.sparkSession.sparkContext.defaultParallelism

    arr = _hashed_shingle_arrays(docs, text, id_col, n)
    _, prefix = _rare_first_prefix(arr, id_col, num, den, max_df, par)

    a = prefix.select(
        F.col(id_col).alias("pid_a"), F.col("sz").alias("sz_a"), "sh_h"
    )
    b = prefix.select(
        F.col(id_col).alias("pid_b"), F.col("sz").alias("sz_b"), "sh_h"
    )
    cand = (
        a.join(b, "sh_h")
        .filter(F.col("pid_a") < F.col("pid_b"))
        .filter(
            F.least("sz_a", "sz_b") * F.lit(den)
            >= F.greatest("sz_a", "sz_b") * F.lit(num)
        )
        .select(F.col("pid_a").alias("id_a"), F.col("pid_b").alias("id_b"))
        .distinct()
    )

    # Stage 1: hashed prefilter over ALL candidates (superset; measured
    # 6.5 s -> ~1.5 s vs string intersects on the sf0.1 candidate set).
    ha = arr.select(F.col(id_col).alias("id_a"), F.col("shh").alias("h_a"))
    hb = arr.select(F.col(id_col).alias("id_b"), F.col("shh").alias("h_b"))
    hinter = F.size(F.array_intersect("h_a", "h_b"))
    hunion = F.size("h_a") + F.size("h_b") - hinter
    survivors = (
        cand.repartition(par, "id_a")
        .join(ha, "id_a")
        .join(hb, "id_b")
        .filter(hinter * F.lit(den) >= hunion * F.lit(num))
        .select("id_a", "id_b")
    )
    # Stage 2: exact string-set Jaccard on survivors; integer-exact
    # threshold test (inter/union >= num/den <=> inter*den >= union*num).
    sa = arr.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = arr.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        survivors.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(inter * F.lit(den) >= union * F.lit(num))
        .select("id_a", "id_b", F.round(inter / union, 5).alias("jaccard"))
    )


def containment_join(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
    max_df: int = 100_000,
) -> DataFrame:
    """Exact CONTAINMENT join: pairs (id_sub, id_super) where
    |sub ∩ super| / |sub| >= threshold — the asymmetric near-dup relation
    (a document quoted/embedded inside a larger one) that symmetric
    Jaccard misses when the host document is much bigger.

    Same prefix-filter guarantee as :func:`allpairs_jaccard_join`, applied
    one-sided: only the CANDIDATE-SUB side's prefix generates join keys
    (C(a->b) >= t bounds the overlap against |a| alone), joined against the
    other documents' FULL postings — candidate volume is
    sum(prefix-shingle df), still governed by rare-first ordering. The
    length filter |super| >= t*|sub| is the only necessary size condition.
    The two-stage verify ends in the true intersection on the full string
    arrays; threshold math is integer-exact throughout."""
    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    par = docs.sparkSession.sparkContext.defaultParallelism

    arr = _hashed_shingle_arrays(docs, text, id_col, n)
    postings, prefix = _rare_first_prefix(arr, id_col, num, den, max_df, par)

    sub = prefix.select(
        F.col(id_col).alias("id_sub"), F.col("sz").alias("sz_sub"), "sh_h"
    )
    full = postings.select(F.col(id_col).alias("id_super"), "sh_h")
    sz_super = arr.select(
        F.col(id_col).alias("id_super"), F.size("sh").alias("sz_super")
    )
    # No broadcast hints anywhere below: sz_super and the shingle-array
    # sides are O(docs) relations — AQE broadcasts them while they fit and
    # falls back to id-keyed shuffle joins at corpus scale.
    cand = (
        sub.join(full, "sh_h")
        .filter(F.col("id_sub") != F.col("id_super"))
        .select("id_sub", "id_super", "sz_sub")
        .distinct()
        .join(sz_super, "id_super")
        .filter(F.col("sz_super") * F.lit(den) >= F.col("sz_sub") * F.lit(num))
        .select("id_sub", "id_super")
    )
    # Two-stage verify (see allpairs_jaccard_join): hashed-containment
    # prefilter (superset: hashed intersection >= true intersection, |sub|
    # identical), then the exact string recompute on survivors only.
    ha = arr.select(F.col(id_col).alias("id_sub"), F.col("shh").alias("h_sub"))
    hb = arr.select(F.col(id_col).alias("id_super"), F.col("shh").alias("h_sup"))
    hinter = F.size(F.array_intersect("h_sub", "h_sup"))
    survivors = (
        cand.repartition(par, "id_sub")
        .join(ha, "id_sub")
        .join(hb, "id_super")
        .filter(hinter * F.lit(den) >= F.size("h_sub") * F.lit(num))
        .select("id_sub", "id_super")
    )
    sa = arr.select(F.col(id_col).alias("id_sub"), F.col("sh").alias("sh_sub"))
    sb = arr.select(F.col(id_col).alias("id_super"), F.col("sh").alias("sh_sup"))
    inter = F.size(F.array_intersect("sh_sub", "sh_sup"))
    return (
        survivors.join(sa, "id_sub")
        .join(sb, "id_super")
        .filter(inter * F.lit(den) >= F.size("sh_sub") * F.lit(num))
        .select(
            "id_sub",
            "id_super",
            F.round(inter / F.size("sh_sub"), 5).alias("containment"),
        )
    )
