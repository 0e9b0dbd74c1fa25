"""Text-analysis operators for LLM training-data pipelines (north star,
BASELINE.json): tokenization, token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All pure Spark built-ins (JVM-side, whole-stage codegen) — no Python in the
hot path. At 100 TB these are narrow per-row projections over the scan:
no shuffle, perfectly parallel, and column pruning means only ``text`` is
read when only text features are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word-boundary tokenizer shared by all text ops.
TOKEN_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: word pieces or single non-space punctuation —
# the classic GPT-2-style coarse split expressible as a regex.
BPE_ISH_RE = r"\w+|[^\w\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Tiny per-language marker-word sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic so the same formula is
# expressible in ANSI SQL for the oracle gate.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "die", "und"),
}


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization CONVENTION shared by every token surface in
    the package AND by the DuckDB oracles (string_split on the same
    regex): note ``split('')`` yields ``['']``, so an empty/whitespace-only
    document counts as ONE empty token on both engines. Changing this
    (e.g. filtering the empty token) must be done in lock-step with every
    oracle; on the driver corpora no document is empty, so the convention
    is never load-bearing there."""
    return F.split(F.lower(F.trim(F.col(text))), TOKEN_SPLIT_RE)


def with_tokens(df: DataFrame, text: str = "text", out: str = "toks") -> DataFrame:
    return df.withColumn(out, tokens_col(text))


def _sum_token_len(text: str) -> Column:
    return F.aggregate(
        tokens_col(text), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _count_in_set(text: str, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens_col(text), lambda x: x.isin(*words)))


def token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish token count, char count, avg token
    length — the token-counting surface of a data pipeline."""
    toks = tokens_col(text)
    n_toks = F.size(toks)
    sum_len = _sum_token_len(text)
    return (
        df.withColumn("n_tokens", n_toks.cast("long"))
        .withColumn("n_bpe_tokens", F.regexp_count(F.col(text), F.lit(BPE_ISH_RE)).cast("long"))
        .withColumn("n_chars_m", F.length(F.col(text)).cast("long"))
        .withColumn(
            "avg_token_len",
            F.round(sum_len / F.nullif(n_toks, F.lit(0)), 6),
        )
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic document quality score in [0,1]:
    0.3*min(tokens/100,1) + 0.3*(1-punct_ratio) + 0.2*stopword_ratio
    + 0.2*min(avg_token_len/10,1). A stand-in for classifier-based quality
    filters; the shape (cheap per-row features -> score -> filter) is the
    production pattern."""
    toks = tokens_col(text)
    n_toks = F.size(toks).cast("double")
    n_stop = _count_in_set(text, STOPWORDS).cast("double")
    n_punct = F.regexp_count(F.col(text), F.lit(r"[^\w\s]")).cast("double")
    n_chars = F.length(F.col(text)).cast("double")
    sum_len = _sum_token_len(text).cast("double")
    punct_ratio = n_punct / F.nullif(n_chars, F.lit(0.0))
    stop_ratio = n_stop / F.nullif(n_toks, F.lit(0.0))
    avg_len = sum_len / F.nullif(n_toks, F.lit(0.0))
    score = (
        0.3 * F.least(n_toks / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.coalesce(punct_ratio, F.lit(0.0)))
        + 0.2 * F.coalesce(stop_ratio, F.lit(0.0))
        + 0.2 * F.least(F.coalesce(avg_len, F.lit(0.0)) / 10.0, F.lit(1.0))
    )
    return (
        df.withColumn("punct_ratio", F.round(F.coalesce(punct_ratio, F.lit(0.0)), 6))
        .withColumn("stopword_ratio", F.round(F.coalesce(stop_ratio, F.lit(0.0)), 6))
        .withColumn("quality", F.round(score, 6))
    )


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: count per-language marker tokens,
    argmax with fixed priority order (en > fr > es > de), 'und' when no
    marker hits."""
    counts: dict[str, Column] = {
        lang: _count_in_set(text, markers) for lang, markers in LANG_MARKERS.items()
    }
    c = counts
    best = F.greatest(*c.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(c["en"] == best, F.lit("en"))
        .when(c["fr"] == best, F.lit("fr"))
        .when(c["es"] == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return df.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) + a polynomial rolling hash over tokens (order-sensitive
    content signature, mod 1e9+7 to stay overflow-free in any engine)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    rolling = F.aggregate(
        F.transform(tokens_col(text), lambda x: (F.ascii(x) * 7 + F.length(x)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * 131 + v) % 1000000007,
    )
    return df.withColumn("fp_md5", F.md5(norm)).withColumn("fp_rolling", rolling)


def fuzzy_name_pairs(
    df, name_col: str, max_dist: int = 1
):
    """Fuzzy self-join on a string column: ALL pairs of DISTINCT values
    within ``max_dist`` Levenshtein edits — via SYMMETRIC-DELETE keys
    (SymSpell), never an all-pairs cross product.

    Each value emits its full string plus every single-character deletion
    as keys: two strings with lev <= 1 always share a key — a
    substitution at position p makes both deletions at p equal, and for
    an insert/delete pair the shorter string IS a deletion key of the
    longer. This covers the full edit alphabet (substitution AND
    insert/delete, i.e. cross-length pairs), unlike position-wildcard
    keys, which silently miss length-changing edits. Shared-prefix mass
    does NOT collapse into one giant bucket (keys stay position-sensitive
    through the deleted character's absence); the loud bucket guard
    catches pathological cliques. Candidates are verified with exact
    ``levenshtein``: precision 1.0, recall 1.0 for max_dist=1 by the
    construction above.

    Cost: O(n · length) narrow (key, value) rows — linear in data. Only
    max_dist=1 is supported (higher radii need multi-deletion key sets,
    combinatorial in length).
    """
    if max_dist != 1:
        raise ValueError("symmetric-delete keying supports max_dist=1 only")
    from .dedup import MAX_BUCKET_SIZE, _BUCKET_PAIR_EXPR, _guard_bucket_size

    names = df.select(F.col(name_col).alias("name")).distinct()
    # p = 0 -> the string itself; p >= 1 -> deletion at position p.
    stacked = (
        names.select(
            "name",
            F.explode(
                F.expr(
                    "transform(sequence(0, length(name)), p -> IF(p = 0, name, "
                    "concat(substring(name, 1, p - 1), "
                    "substring(name, p + 1, length(name) - p))))"
                )
            ).alias("wkey"),
        )
        .distinct()  # repeated chars give identical deletion keys
    )
    buckets = _guard_bucket_size(
        stacked.groupBy("wkey")
        .agg(F.collect_list("name").alias("ds"))
        .filter(F.size("ds") > 1),
        MAX_BUCKET_SIZE,
    )
    return (
        buckets.select(F.explode(F.expr(_BUCKET_PAIR_EXPR)).alias("p"))
        .select(F.col("p.doc_a").alias("name_a"), F.col("p.doc_b").alias("name_b"))
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )


def bm25_topk(
    docs: DataFrame,
    query_doc_id: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact BM25 (Okapi, Lucene idf form) top-k retrieval with the tokens
    of one corpus document as the query. Returns (id, bm25, lex_rank).

    Plan shape (100 TB):
    - the postings build (explode -> per-doc tf) is the standard inverted
      -index shuffle, O(total tokens) narrow rows;
    - query terms BROADCAST against the postings, so only postings of
      matching terms survive the join — the corpus is scanned once and
      never reshuffled on doc_id;
    - document frequency comes from ONE analytic count partitioned by
      token over the matched postings (no second aggregate + join-back);
    - corpus stats (N, avgdl) ride in as a broadcast single-row cross
      join; top-k is the per-partition TakeOrdered heap.
    Scores round to 4 decimals before ranking (sum order across engines
    differs at ~1e-15 relative; ranks must be bit-stable), ties break on
    id. No reference twin (LLM-retrieval extension, SURVEY.md §2).
    """
    from pyspark.sql.window import Window

    base = docs.select(F.col(id_col), tokens_col(text).alias("toks"))
    postings = (
        base.select(id_col, F.size("toks").alias("dl"), F.explode("toks").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    stats = base.select(F.size("toks").alias("dl")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = (
        base.filter(F.col(id_col) == query_doc_id)
        .select(F.explode("toks").alias("token"))
        .distinct()
    )
    wtok = Window.partitionBy("token")
    scored = (
        postings.join(F.broadcast(qterms), "token")
        .withColumn("df", F.count(F.lit(1)).over(wtok).cast("double"))
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "score_t",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    topk = (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("score_t"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )
    wr = Window.orderBy(F.col("bm25").desc(), id_col)
    return topk.withColumn("lex_rank", F.row_number().over(wr).cast("long"))
