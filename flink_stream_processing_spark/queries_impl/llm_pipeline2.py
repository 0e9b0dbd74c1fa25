"""Training-data pipeline operators, batch 2 (LLM extension): Gopher-style
quality rules, deterministic stratified sampling, sequence packing into
fixed context windows, PII-style redaction, embedding int8 quantization,
and training-mix weighting. Every query carries a full DuckDB oracle that
mirrors the formula exactly (same tokenizer, same arithmetic order, same
rounding) — see llm_text.py for the shared conventions.

Scale design (100 TB):
- quality rules / redaction / quantization are narrow per-row projections
  (no shuffle; only the needed column is scanned);
- stratified sampling is a per-row hash test — no shuffle, no sort, and
  the sample is reproducible across runs/engines (seeded md5, not rand());
- sequence packing is ONE window over the doc order — at scale the order
  column is a pre-sorted layout key, so the window runs partition-local
  after a range partitioning; the output is the (doc -> context-window
  span) map a pretraining dataloader consumes;
- mix weighting aggregates per lang (5 keys) and joins a broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries import query
from ..sources.batch import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


def _toks():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


# ------------------------------------------------------- Gopher quality rules

_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         {_TOKS} AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS n_sym
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT) AS max_word_len,
         round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / nullif(len(toks), 0), 6) AS mean_word_len,
         round(CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
               / nullif(len(toks), 0), 6) AS alpha_word_frac,
         round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(len(toks), 0), 6)
           AS dup_word_frac,
         round(n_sym / nullif(n_chars, 0), 6) AS symbol_ratio
  FROM t
)
SELECT doc_id, n_words, max_word_len, mean_word_len, alpha_word_frac,
       dup_word_frac, symbol_ratio,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND alpha_word_frac >= 0.8 AND symbol_ratio <= 0.1) AS gopher_pass
FROM m
"""


@query("gopher_quality_rules", oracle=_GOPHER_ORACLE)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021, public) repetition/format rules:
    word-count bounds, mean word length band, alphabetic-word fraction,
    duplicate-word fraction, symbol ratio — plus the composite pass flag a
    curation pipeline filters on. Pure JVM expressions, one pass."""
    toks = _toks()
    lens = F.transform(toks, lambda x: F.length(x))
    n_words = F.size(toks)
    mean_wl = F.round(
        F.aggregate(lens, F.lit(0).cast("double"), lambda a, x: a + x)
        / F.nullif(n_words.cast("double"), F.lit(0.0)),
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda x: x.rlike(r"^[a-z]+$"))).cast("double")
        / F.nullif(n_words.cast("double"), F.lit(0.0)),
        6,
    )
    dup_frac = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double")
        / F.nullif(n_words.cast("double"), F.lit(0.0)),
        6,
    )
    sym_ratio = F.round(
        F.size(F.regexp_extract_all("text", F.lit(r"[^a-zA-Z0-9\s]"), F.lit(0))).cast(
            "double"
        )
        / F.nullif(F.length("text").cast("double"), F.lit(0.0)),
        6,
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.array_max(lens).cast("long").alias("max_word_len"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        dup_frac.alias("dup_word_frac"),
        sym_ratio.alias("symbol_ratio"),
    )
    gpass = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("symbol_ratio") <= 0.1)
    )
    return d.withColumn("gopher_pass", gpass)


# --------------------------------------------------- stratified hash sampling

_SAMPLE_RATES = {"en": 0.5, "fr": 0.3, "es": 0.3, "de": 0.2, "zh": 0.2}

_STRAT_ORACLE = """
WITH u AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('smpl' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS unif,
         CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.3 WHEN 'es' THEN 0.3
                   WHEN 'de' THEN 0.2 WHEN 'zh' THEN 0.2 ELSE 0.0 END AS rate
  FROM documents
)
SELECT doc_id, lang, round(unif, 6) AS unif
FROM u WHERE unif < rate
"""


@query("stratified_sample", oracle=_STRAT_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    per-language keep rates applied via a seeded md5 uniform (NOT rand()),
    so the sample is bit-reproducible across runs, engines, and partition
    layouts — the property that makes a 100 TB sample auditable. Per-row
    hash test: no shuffle, no sort, fully parallel."""
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.lit("smpl"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = None
    for lang, r in _SAMPLE_RATES.items():
        cond = F.col("lang") == lang
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = rate.otherwise(0.0)
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", unif.alias("unif"), rate.alias("rate"))
        .filter(F.col("unif") < F.col("rate"))
        .select("doc_id", "lang", F.round("unif", 6).alias("unif"))
    )


# ----------------------------------------------------------- sequence packing

_PACK_CAPACITY = 256

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  -- DuckDB's windowed sum() over BIGINT yields HUGEINT, which the driver's
  -- hash comparator float-ifies; cast back to BIGINT so dtypes match Spark.
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS BIGINT) AS token_start
  FROM t
)
SELECT doc_id, n_tokens, token_start,
       CAST(token_start // {_PACK_CAPACITY} AS BIGINT) AS first_chunk,
       CAST((token_start + n_tokens - 1) // {_PACK_CAPACITY} AS BIGINT) AS last_chunk,
       CAST(((token_start + n_tokens - 1) // {_PACK_CAPACITY})
         - (token_start // {_PACK_CAPACITY}) + 1 AS BIGINT) AS n_chunks
FROM o
"""


@query("sequence_packing", oracle=_PACK_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing: documents are concatenated in doc_id
    order and chunked into fixed {cap}-token context windows (documents
    straddle window boundaries — the standard concat-then-chunk packing).
    Output maps each doc to its token span and chunk range: what a
    dataloader needs to materialize window i. One running-sum window over
    the doc order; at 100 TB the order key is the sorted layout key so the
    cumulative sum is computed per range-partition with partial sums —
    the same shape as any distributed prefix sum.""".format(cap=_PACK_CAPACITY)
    toks_n = F.size(_toks()).cast("long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks_n.alias("n_tokens")
    )
    o = t.withColumn("token_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    cap = F.lit(_PACK_CAPACITY).cast("long")
    first = (F.col("token_start") / cap).cast("long")
    last = ((F.col("token_start") + F.col("n_tokens") - 1) / cap).cast("long")
    return o.select(
        "doc_id",
        "n_tokens",
        "token_start",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


# ------------------------------------------------------- PII-style redaction

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"

_REDACT_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE text END AS text2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       md5(regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS redacted_md5,
       CAST(length(regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS BIGINT)
         AS redacted_len
FROM t
"""


@query("text_redaction", oracle=_REDACT_ORACLE)
def q_text_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: find-and-mask email addresses (the pattern is
    dialect-portable between Java regex and DuckDB RE2). The corpus has no
    organic emails, so a deterministic synthetic email is injected into
    every 5th doc FIRST — the operator is then verified on text where the
    expected match set is known exactly. Output carries the md5 of the
    redacted text so any masking difference hash-mismatches. Narrow
    per-row projection — the 100 TB shape of every scrubbing pass."""
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    t = load_table(spark, sf_dir, "documents").select("doc_id", injected.alias("text2"))
    redacted = F.regexp_replace("text2", _EMAIL_RE, "<EMAIL>")
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# -------------------------------------------------- embedding int8 quantizing

_QUANT_ORACLE = """
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
), e AS (
  SELECT s.vec_id, s.scale,
         list_max(list_transform(embeddings.embedding,
             x -> abs(floor(CAST(x AS DOUBLE) / s.scale + 0.5) * s.scale
                      - CAST(x AS DOUBLE)))) AS max_err
  FROM s JOIN embeddings ON s.vec_id = embeddings.vec_id
)
SELECT vec_id, round(scale, 6) AS scale, round(max_err, 6) AS max_err,
       (max_err <= scale / 2.0 + 1e-12) AS within_bound
FROM e
"""


@query("embedding_quantization", oracle=_QUANT_ORACLE)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = max|v|/127, q_i = round-half-up(v_i/scale), and the max
    reconstruction error |q_i*scale - v_i| — with the theoretical bound
    (err <= scale/2) emitted as a checked boolean. Round-half-up is spelled
    floor(x+0.5) on BOTH sides (Spark round() and DuckDB round() disagree
    on ties). Narrow projection: the 100 TB shape of a corpus-wide
    embedding compression pass (4x memory cut for ANN serving)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", v.alias("v"), scale.alias("scale")
    )
    err = F.array_max(
        F.transform(
            F.col("v"),
            lambda x: F.abs(
                F.floor(x / F.col("scale") + F.lit(0.5)) * F.col("scale") - x
            ),
        )
    )
    # err is materialized BEFORE the rounding projection: aliasing the
    # rounded value back to "scale" in the same select would rebind the
    # lambda's scale reference to the rounded column.
    with_err = emb.withColumn("max_err_raw", err)
    return with_err.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round("max_err_raw", 6).alias("max_err"),
        (F.col("max_err_raw") <= F.col("scale") / 2.0 + 1e-12).alias("within_bound"),
    )


# --------------------------------------------------------- training-mix plan

_MIX_WEIGHTS = {"en": 0.4, "fr": 0.15, "es": 0.15, "de": 0.15, "zh": 0.15}

_MIX_ORACLE = f"""
WITH tok AS (
  SELECT lang, CAST(sum(len({_TOKS})) AS DOUBLE) AS lang_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT sum(lang_tokens) AS all_tokens FROM tok
), w(lang, target_frac) AS (
  VALUES ('en', 0.4), ('fr', 0.15), ('es', 0.15), ('de', 0.15), ('zh', 0.15)
)
SELECT tok.lang,
       CAST(lang_tokens AS BIGINT) AS lang_tokens,
       round(lang_tokens / all_tokens, 6) AS actual_frac,
       target_frac,
       round(target_frac / (lang_tokens / all_tokens), 6) AS sample_multiplier
FROM tok, tot JOIN w ON w.lang = tok.lang
"""


@query("corpus_mix_weights", oracle=_MIX_ORACLE)
def q_corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: per-language token mass vs a target mix,
    yielding the per-language sampling multiplier (epochs-per-doc) that a
    weighted dataloader or the stratified sampler consumes. One tiny
    aggregate (5 keys) + a broadcast dim join."""
    toks_n = F.size(_toks()).cast("double")
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("lang", toks_n.alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").alias("lang_tokens"))
    )
    # Grand total via a window over the 5 aggregated rows — NOT a
    # crossJoin(broadcast(agg)): building that broadcast executes the whole
    # tokenize+aggregate subtree a second time (the broadcast side can't
    # reuse the probe side's result), which tripled this query's cost.
    w_all = Window.partitionBy()
    all_tokens = F.sum("lang_tokens").over(w_all)
    # The target mix is a config constant: a literal CASE, not a
    # createDataFrame dim — a Python-RDD-backed 5-row relation costs a
    # Python-worker round trip per invocation (seconds of jitter in a busy
    # session); real external dims join broadcast as the other queries do.
    tf = None
    for lang, wgt in _MIX_WEIGHTS.items():
        cond = F.col("lang") == lang
        tf = F.when(cond, wgt) if tf is None else tf.when(cond, wgt)
    return (
        tok.withColumn("all_tokens", all_tokens)
        .withColumn("target_frac", tf)
        .select(
            "lang",
            F.col("lang_tokens").cast("long").alias("lang_tokens"),
            F.round(F.col("lang_tokens") / F.col("all_tokens"), 6).alias("actual_frac"),
            "target_frac",
            F.round(
                F.col("target_frac") / (F.col("lang_tokens") / F.col("all_tokens")), 6
            ).alias("sample_multiplier"),
        )
    )


# ------------------------------------------------- semantic dedup composition

_SEMANTIC_ORACLE = f"""
WITH q AS (
  SELECT doc_id, lang FROM documents
  WHERE len({_TOKS}) >= 30
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings JOIN q ON embeddings.vec_id = q.doc_id
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 5) AS sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
), dropped AS (
  SELECT DISTINCT id_b AS doc_id FROM p WHERE sim >= 0.45
)
SELECT doc_id, lang FROM q
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY doc_id
"""


@query("semantic_dedup_keep", oracle=_SEMANTIC_ORACLE)
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed SEMANTIC dedup: quality gate (>= 30 tokens) -> join each
    surviving doc to its embedding -> embedding-cosine near-dup pairs via
    the recall-certified multi-table LSH path -> greedy min-id keep (drop
    any doc with a semantic near-dup of smaller id — the same deterministic
    representative policy as exact_dedup). The oracle recomputes the pair
    set with exact all-pairs cosine, so the hash match certifies the
    composition end-to-end: quality filter, join, LSH recall, and the keep
    policy. Restricting candidates to the filtered subset cannot lose
    pairs (bucket membership is per-doc), so LSH recall 1.0 carries over.

    100 TB shape: the gate and join are narrow / keyed; near-dup cost is
    the LSH path's O(docs x tables) shuffle; the anti-join touches only
    (doc_id) keys."""
    from ..operators.similarity import embedding_near_dup_pairs

    d = load_table(spark, sf_dir, "documents").filter(F.size(_toks()) >= 30)
    emb = load_table(spark, sf_dir, "embeddings").join(
        d.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    pairs = embedding_near_dup_pairs(emb, threshold=0.45, n_tables=16)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        d.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# -------------------------------------------------------- text normalization

_NORM_ORACLE = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f]', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id,
       md5(norm_text) AS norm_md5,
       CAST(length(norm_text) AS BIGINT) AS norm_len
FROM n
"""


@query("text_normalization", oracle=_NORM_ORACLE)
def q_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the step before any fingerprint/dedup
    pass): lowercase, strip control characters, collapse whitespace runs,
    trim. Output is gated by the md5 of the normalized text, so any
    difference in the normalization pipeline hash-mismatches. ASCII-safe
    operations only — unicode NFC needs ICU and is deliberately out of the
    dialect-portable oracle contract. Narrow per-row projection."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[\x00-\x1f]", " "),
            r"\s+",
            " ",
        )
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    )


# ------------------------------------------------------------ shard planning

_N_SHARDS = 16

_SHARD_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {_N_SHARDS} AS BIGINT) AS shard,
         CAST(octet_length(encode(text)) AS BIGINT) AS doc_bytes
  FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_bytes) AS BIGINT) AS total_bytes
FROM s GROUP BY shard ORDER BY shard
"""


@query("shard_assignment", oracle=_SHARD_ORACLE)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-layout planning: deterministic hash-shard assignment (seeded
    md5 mod N — reproducible across engines, unlike hashpartitioning) with
    per-shard doc count and byte mass. This is the report that validates a
    training-data export's balance BEFORE writing; the write itself is
    repartitionByRange/partitionBy on the same key. One narrow projection
    + one {_N_SHARDS}-key aggregate."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            shard.alias("shard"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("doc_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------- TF-IDF top terms

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY token
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
), s AS (
  SELECT tf.doc_id, tf.token,
         round(tf * ln(nd / df), 6) AS tfidf
  FROM tf JOIN df USING (token), n
), r AS (
  SELECT doc_id, token, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, token) AS BIGINT) AS rk
  FROM s
)
SELECT doc_id, token, tfidf, rk FROM r WHERE rk <= 3
ORDER BY doc_id, rk
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms: explode tokens -> per-(doc,token) tf ->
    per-token document frequency -> idf = ln(N/df) -> rank window. N comes
    from a count-only scan (parquet aggregate pushdown: metadata, not
    data). Ranking uses the ROUNDED tfidf with a token tiebreak so the
    top-3 cut is deterministic across engines (full-precision ln() can
    differ in the last ulp between libm implementations).

    100 TB shape: the explode shuffle carries O(total tokens) narrow rows
    — the inherent cost of global document frequency; everything after
    aggregates or broadcasts. The df table is vocabulary-sized and would
    broadcast at any realistic vocabulary."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    # r19 note: a spread_fanout on the tokenize base was tried and REVERTED
    # — plain tokenize+explode is too light to pay for the extra exchange
    # (kill-switch A/B min 1.65 s unspread vs 2.02 s spread at sf0.1).
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.select(F.count(F.lit(1)).cast("double").alias("nd"))
    s = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("nd") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        s.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


# ------------------------------------------------------ n-gram repetition

_REP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), g AS (
  SELECT doc_id,
         len(toks) - 1 AS n_bigrams,
         len(list_distinct(list_transform(range(len(toks) - 1),
             i -> toks[i + 1] || ' ' || toks[i + 2]))) AS n_distinct_bigrams,
         len(toks) - 2 AS n_trigrams,
         len(list_distinct(list_transform(range(len(toks) - 2),
             i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])))
           AS n_distinct_trigrams
  FROM t WHERE len(toks) >= 3
)
SELECT doc_id,
       round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6)
         AS dup_bigram_frac,
       round(1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams, 6)
         AS dup_trigram_frac,
       (1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams > 0.5) AS repetitive
FROM g
"""


@query("ngram_repetition", oracle=_REP_ORACLE)
def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter over token n-grams (the Gopher/C4 class of rule
    that catches boilerplate and generation loops): duplicate bigram /
    trigram fractions per doc plus a pass/fail flag. Pure array
    expressions over one narrow projection — no explode, no shuffle."""
    toks = _toks()

    def grams(n: int):
        parts = ", ".join(f"t[i+{j}]" for j in range(n))
        return F.expr(
            f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {parts}))"
        )

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 3)
    )
    n_bi = F.size("t") - 1
    n_tri = F.size("t") - 2
    dup_bi = F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams(2))).cast("double") / n_bi, 6
    )
    dup_tri = F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams(3))).cast("double") / n_tri, 6
    )
    return base.select(
        "doc_id",
        dup_bi.alias("dup_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
        (
            F.lit(1.0) - F.size(F.array_distinct(grams(2))).cast("double") / n_bi
            > 0.5
        ).alias("repetitive"),
    )
