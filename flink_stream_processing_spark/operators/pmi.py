"""PMI collocation mining — statistically-bound phrase candidates for
vocabulary/tokenizer work (r19 library capability, post-saturation
policy: no registry entry; laws + hypothesis sweep vs an exact Python
model + in-suite DuckDB oracle + scale rung).

The pipeline op this is: phrase mining for corpus curation — find word
pairs that co-occur far more than chance ("new york", "machine
learning") to protect them as units during tokenization/analysis
(AutoPhrase-style candidate generation: Shang et al., "Automated phrase
mining from massive text corpora", TKDE 2018 seed their quality scores
with exactly these co-occurrence statistics; word2vec's phrase pass,
Mikolov et al. NeurIPS 2013 §4, is the same score with a discount).
Pointwise mutual information over ADJACENT pairs (window = 1, the
bigram convention shared with `operators/lm.py` — at larger windows the
algebra is identical, only the pair extraction changes):

    pmi(a, b)  = log( p(a,b) / (p(a)·p(b)) )
               = log( c(a,b) · N_uni² / (N_bi · c(a) · c(b)) )  as counted
    npmi(a, b) = pmi / (-log p(a,b))       in (-1, 1], 1 = perfect
                                           collocation (Bouma 2009)

with a min-count floor (PMI's low-frequency pathology: a pair seen once
between two hapaxes scores arbitrarily high — the floor is the standard
fix and is part of the contract, not a tuning afterthought).

COUNT STATE = `PMICounts(unigrams, pairs, totals)` — all plain additive
sums: shards/days merge LOSSLESSLY by keyed sum (the LM/BPE maintenance
story; `totals` is a single row carrying both normalizers so scoring
never re-derives them with extra passes). Scoring is vocabulary-sized:
two hash joins of the pair table against the unigram table + pure
column math — the corpus is long gone by then.

Unigram convention: c(w) counts EVERY token occurrence (not just
context positions — unlike lm.py, whose n1 is a conditional-probability
denominator; PMI's marginals are occurrence probabilities). N_uni =
total tokens, N_bi = total adjacent pairs = N_uni − n_docs.

LAWS (test-pinned in tests/test_pmi.py):
- lossless merge: counts over shards/days sum to the whole-corpus
  counts, commutatively — so scores match too;
- exact scores: pmi/npmi match an exact Python model (hypothesis sweep
  over random corpora, floors swept);
- oracle: the scored table over the documents fixture matches DuckDB
  recomputing the whole chain (round 6);
- independence baseline: on a corpus where b follows a at exactly its
  marginal rate, pmi(a,b) ≈ 0; a perfectly-fused pair scores npmi 1;
- floor: no pair below min_count appears, ever;
- plan: pair extraction is in-array (no positional self-join); scoring
  joins are vocabulary-sized; the totals row rides the scalar
  broadcast convention (≤1 BNLJ).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

_PMI_MIN_COUNT = 5


class PMICounts(NamedTuple):
    unigrams: DataFrame  # (w, cnt long) — every occurrence
    pairs: DataFrame  # (a, b, cnt long) — adjacent, directed
    totals: DataFrame  # single row (n_uni long, n_bi long)


def pmi_counts(corpus: DataFrame, text: str = "text") -> PMICounts:
    """The corpus-scale pass: tokens exploded once for unigrams, the
    in-array adjacent-pair zip exploded once for pairs (the lm.py
    extraction), both map-side combined; totals ride along as sums of
    the (tiny) count frames — no third corpus scan."""
    toks = tokens_col(text)
    uni = (
        corpus.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pair = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("a"),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("b"),
        )
    ).alias("p")
    pairs = (
        corpus.select(pair)
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = (
        uni.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_uni"))
        .crossJoin(
            F.broadcast(
                pairs.agg(
                    F.coalesce(F.sum("cnt"), F.lit(0))
                    .cast("long")
                    .alias("n_bi")
                )
            )
        )
    )
    return PMICounts(unigrams=uni, pairs=pairs, totals=totals)


def pmi_merge(a: PMICounts, b: PMICounts) -> PMICounts:
    """Merge shard/day counts: keyed sums everywhere — lossless, scores
    over the merge equal scores over the union corpus."""
    at = a.totals.select(
        F.col("n_uni").alias("ua"), F.col("n_bi").alias("ba")
    )
    bt = b.totals.select(
        F.col("n_uni").alias("ub"), F.col("n_bi").alias("bb")
    )
    return PMICounts(
        unigrams=a.unigrams.unionByName(b.unigrams)
        .groupBy("w")
        .agg(F.sum("cnt").cast("long").alias("cnt")),
        pairs=a.pairs.unionByName(b.pairs)
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt")),
        totals=at.crossJoin(F.broadcast(bt)).select(
            (F.col("ua") + F.col("ub")).cast("long").alias("n_uni"),
            (F.col("ba") + F.col("bb")).cast("long").alias("n_bi"),
        ),
    )


def pmi_score(counts: PMICounts, min_count: int = _PMI_MIN_COUNT) -> DataFrame:
    """(a, b, pair_cnt, pmi, npmi) for every pair at or above the
    min-count floor, npmi descending then (a, b). Vocabulary-sized: two
    hash joins against the unigram table + the totals scalar ride-in;
    the corpus is never touched."""
    ua = counts.unigrams.select(F.col("w").alias("a"), F.col("cnt").alias("ca"))
    ub = counts.unigrams.select(F.col("w").alias("b"), F.col("cnt").alias("cb"))
    p_ab = F.col("cnt") / F.col("n_bi")
    # log-sum form, NOT log-of-product: cnt·n_uni² overflows BIGINT on a
    # web-scale corpus; the sum of logs is overflow-free and the oracle
    # uses the identical association order
    pmi = (
        F.log("cnt")
        + 2 * F.log("n_uni")
        - F.log("n_bi")
        - F.log("ca")
        - F.log("cb")
    )
    return (
        counts.pairs.filter(F.col("cnt") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(counts.totals))
        .select(
            "a",
            "b",
            F.col("cnt").alias("pair_cnt"),
            F.round(pmi, 6).alias("pmi"),
            # npmi's normalizer −log p(a,b) is 0 when ONE pair type holds
            # the entire pair mass (p == 1, e.g. a single-bigram corpus):
            # no collocation signal exists and under Spark's ANSI mode
            # the raw division is a runtime error, so the guard emits
            # NULL (kept in the untaken CASE branch)
            F.when(
                F.col("cnt") < F.col("n_bi"),
                F.round(pmi / -F.log(p_ab), 6),
            ).alias("npmi"),
        )
        .orderBy(F.desc("npmi"), "a", "b")
    )


# --- in-suite DuckDB oracle (post-saturation policy item 1) -----------------
# The whole chain is SQL-expressible; the fixture gate scores the
# documents table at the default floor.

PMI_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
), pr AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT toks[i] AS a, toks[i + 1] AS b
    FROM t, unnest(range(1, len(toks))) AS r(i)
  ) GROUP BY a, b
), tot AS (
  SELECT (SELECT sum(cnt) FROM uni) AS n_uni,
         (SELECT sum(cnt) FROM pr) AS n_bi
)
SELECT pr.a, pr.b, pr.cnt AS pair_cnt,
       round(ln(pr.cnt) + 2 * ln(tot.n_uni) - ln(tot.n_bi)
             - ln(ua.cnt) - ln(ub.cnt), 6) AS pmi,
       CASE WHEN pr.cnt < tot.n_bi THEN
         round((ln(pr.cnt) + 2 * ln(tot.n_uni) - ln(tot.n_bi)
                - ln(ua.cnt) - ln(ub.cnt))
               / -ln(CAST(pr.cnt AS DOUBLE) / tot.n_bi), 6)
       END AS npmi
FROM pr
JOIN uni ua ON pr.a = ua.w
JOIN uni ub ON pr.b = ub.w
CROSS JOIN tot
WHERE pr.cnt >= {_PMI_MIN_COUNT}
ORDER BY npmi DESC, a, b
"""
