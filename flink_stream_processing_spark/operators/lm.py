"""N-gram language-model quality scoring — CCNet-style perplexity
filtering for corpus curation (r19 library capability, post-saturation
policy: no registry entry; laws + hypothesis sweep vs an exact Python
model + in-suite DuckDB oracle + scale rung).

The production recipe this re-expresses: CCNet (Wenzek et al., "CCNet:
Extracting high quality monolingual datasets from web crawl data",
LREC 2020, §3.3) ranks/filters web documents by the perplexity of a
language model trained on a trusted corpus — low perplexity ≈
Wikipedia-like text, high ≈ boilerplate/gibberish. The registered
quality family (`gopher_quality_rules`, `quality_scores`,
`char_entropy_quality`) covers rule-based signals; this module adds the
MODEL-based signal with an exactly-specified, engine-reproducible model
(add-k–smoothed bigrams over the package's whitespace token
convention), so the score carries a bit-identical cross-engine oracle
instead of an opaque binary blob:

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)
    logprob(doc) = Σ over the doc's n-1 interior transitions
    ppl(doc)     = exp(-logprob / (n-1))          (n ≥ 2 tokens)

V = distinct unigram count of the TRAINING corpus; an unseen context
row backs off to k/(k·V) = 1/V via the same formula (coalesce-0
counts), so every probability is strictly positive and the score is
total. Docs under 2 tokens carry NULL score (no transitions to judge —
the caller's length filter owns them; Gopher's min-length rule already
rejects them upstream).

MODEL STATE = two mergeable count frames + the scalar V:
`LMModel(unigrams(w1, n1), bigrams(w1, w2, n2))`. Counts are plain
additive sums, so the maintenance story is the store family's: shards
train independently and merge LOSSLESSLY (keyed sum), a new ingest
day's delta counts fold in without re-scanning the corpus, and the
N-day incremental model equals the from-scratch model exactly
(law-pinned — the daily-cycle pattern at the model level).

100 TB DESIGN: scoring explodes each doc into its (w1, w2) transitions
(in-array slice/zip, one narrow pass — never a self-join on position),
joins the model's bigram and unigram frames on their natural keys (two
hash joins that co-locate under (w1)-bucketed model tables; the model
is usually the SMALL side but is NOT assumed broadcastable — a web-
scale bigram vocabulary is bigger than an executor), and folds back
with one groupBy(doc_id). Training is two map-side-combined groupBys
over the same exploded pass. Nothing touches the driver; no UDFs.

LAWS (test-pinned in tests/test_lm.py):
- lossless merge: lm_merge(train(A), train(B)) == train(A ⊎ B) exactly
  (both frames), commutative;
- incremental ≡ rebuild: folding daily deltas over N days equals the
  from-scratch model over the concatenated corpus;
- exact scores: perplexity matches an exact Python model to float
  tolerance (hypothesis sweep over random corpora/batches, k swept);
- oracle: scores over the documents fixture bit-identical (round 6) to
  DuckDB recomputing the full chain — tokenization, counts, smoothing,
  log arithmetic;
- plan: no cartesian (the scalar V rides the package's broadcast
  crossJoin convention), in-array transition generation (no
  positional self-join), one groupBy per score pass.

Reference parity note: the reference (StreamJob.java) has no text
analytics at all — this belongs to the LLM-pipeline extension's
quality-scoring arc next to the registered rule-based family.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

# Default add-k smoothing mass. CCNet uses Kneser-Ney inside KenLM; the
# add-k form is chosen here because it is EXACTLY reproducible in SQL on
# both engines (the oracle requirement) while ranking documents the same
# way for curation purposes at fixed k.
_LM_K = 1.0


class LMModel(NamedTuple):
    unigrams: DataFrame  # (w1 string, n1 long) — context counts
    bigrams: DataFrame  # (w1 string, w2 string, n2 long) — transition counts


def _transitions(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, w1, w2) — one row per interior transition, generated
    IN-ARRAY (slice + arrays_zip over the token array), so a doc never
    self-joins on position and the only wide op downstream is the
    model-count join. Docs with < 2 tokens contribute nothing."""
    toks = tokens_col(text)
    pair = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
        )
    ).alias("t")
    return docs.select("doc_id", pair).select(
        "doc_id", F.col("t.w1").alias("w1"), F.col("t.w2").alias("w2")
    )


def lm_train(corpus: DataFrame, text: str = "text") -> LMModel:
    """Count the training corpus: one exploded transition pass feeds the
    bigram aggregate; the unigram CONTEXT counts aggregate the same
    rows' w1 (so c(w1) = Σ_w2 c(w1, w2) — the last token of a doc is
    not a context, keeping Σ p(·|w1) = 1 under the smoothing). Both
    groupBys are map-side combined."""
    tr = _transitions(corpus, text)
    return LMModel(
        unigrams=tr.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1")),
        bigrams=tr.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("n2")
        ),
    )


def lm_merge(a: LMModel, b: LMModel) -> LMModel:
    """Merge shard/day models: keyed sums on both frames. LOSSLESS
    (law-pinned): equals training over the concatenated corpus — shards
    and ingest days never re-scan each other."""
    return LMModel(
        unigrams=a.unigrams.unionByName(b.unigrams)
        .groupBy("w1")
        .agg(F.sum("n1").cast("long").alias("n1")),
        bigrams=a.bigrams.unionByName(b.bigrams)
        .groupBy("w1", "w2")
        .agg(F.sum("n2").cast("long").alias("n2")),
    )


def lm_vocab_size(model: LMModel) -> DataFrame:
    """Single-row (v) frame — the smoothing denominator's vocabulary
    size, broadcast into the score pass via the package's scalar
    crossJoin convention."""
    return model.unigrams.agg(F.count(F.lit(1)).cast("long").alias("v"))


def lm_score(
    docs: DataFrame,
    model: LMModel,
    k: float = _LM_K,
    text: str = "text",
) -> DataFrame:
    """Per-doc add-k bigram log-probability and perplexity:
    (doc_id, n_transitions, logprob, ppl), NULL-scored for docs with no
    transition — and for EVERY doc when the model is EMPTY (V == 0: a
    training corpus with no transition at all defines no distribution;
    the guard matters concretely because the smoothing denominator is
    then 0 + k·0 and Spark 4's ANSI mode turns that division into a
    runtime error, not an Infinity). Two hash joins on the model's
    natural keys (NOT forced broadcast — a web-scale model outgrows an
    executor; Spark/AQE still broadcasts small models on its own) + one
    groupBy(doc_id)."""
    tr = _transitions(docs, text)
    v = lm_vocab_size(model)
    scored = (
        tr.join(model.unigrams, "w1", "left")
        .join(model.bigrams, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.when(
                F.col("v") > 0,
                F.log(
                    (F.coalesce("n2", F.lit(0)).cast("double") + F.lit(k))
                    / (
                        F.coalesce("n1", F.lit(0)).cast("double")
                        + F.lit(k) * F.col("v").cast("double")
                    )
                ),
            ).alias("lp"),
        )
    )
    return (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_transitions"),
                F.sum("lp").alias("logprob"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_transitions", F.lit(0).cast("long")).alias(
                "n_transitions"
            ),
            F.round("logprob", 6).alias("logprob"),
            F.round(
                F.exp(-F.col("logprob") / F.col("n_transitions")), 6
            ).alias("ppl"),
        )
    )


# --- in-suite DuckDB oracle (post-saturation policy item 1) -----------------
# The whole chain — tokenization, transition generation, counts, add-k
# smoothing, log arithmetic — is SQL-expressible, so the score over the
# documents fixture (self-trained: model and scored set both = the
# documents table, the standard corpus-statistics shape) gets the
# driver-equivalent bit-identical gate without a registry row.

LM_PPL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), tr AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(range(1, len(toks))) AS r(i)
), uni AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM tr GROUP BY w1
), bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2 FROM tr GROUP BY w1, w2
), v AS (
  SELECT CAST(count(*) AS BIGINT) AS v FROM uni
), lp AS (
  SELECT tr.doc_id,
         ln((COALESCE(bi.n2, 0) + {_LM_K}) /
            (COALESCE(uni.n1, 0) + {_LM_K} * v.v)) AS lp
  FROM tr
  LEFT JOIN uni USING (w1)
  LEFT JOIN bi USING (w1, w2)
  CROSS JOIN v
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
         sum(lp) AS logprob
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_transitions, 0) AS n_transitions,
       round(agg.logprob, 6) AS logprob,
       round(exp(-agg.logprob / agg.n_transitions), 6) AS ppl
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""
