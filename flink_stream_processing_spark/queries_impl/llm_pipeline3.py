"""Third LLM-pipeline wave: distributed k-means (one Lloyd iteration,
oracle-checked), rolling-hash content-defined chunking, and a
character-entropy quality score.

Together with llm_pipeline2 these cover the clustering / chunking /
quality-scoring stages of a training-data pipeline. All three are
engine-deterministic: the k-means distance is plain double arithmetic, the
CDC boundary test is integer polynomial hashing (no engine hash functions,
which differ between Spark and DuckDB), and the entropy is a closed-form
per-row expression — so each query carries an exact DuckDB oracle.

Scale notes (100 TB):
- k-means: centroids are broadcast (k×d doubles — kilobytes); assignment is
  a map-only pass over the corpus; the update is a (cluster, dim) keyed agg
  whose cardinality is k×d, independent of corpus size. This is exactly how
  MLlib's KMeans structures an iteration; expressing it in DataFrame ops
  keeps it inside codegen and lets the same shape run per-iteration in a
  driver loop.
- CDC chunking: per-row array math, no shuffle; boundary positions never
  leave the executor — only per-doc chunk stats are emitted.
- Entropy: 28 fixed string-replace counts per row, no explode — the
  explode-chars-then-groupBy alternative multiplies the shuffle volume by
  average document length and is exactly what NOT to do at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import query
from ..sources.batch import load_table

_K = 8  # clusters; centroids seeded from vec_id 0..7 (deterministic)


def _emb_double(df: DataFrame) -> DataFrame:
    """Embeddings cast float→double once so every downstream arithmetic op
    (both engines) runs in double precision on identical inputs."""
    return df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


_KMEANS_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cent AS (
  SELECT vec_id AS cluster, v AS c FROM emb WHERE vec_id < {_K}
), dist AS (
  SELECT e.vec_id, c.cluster,
         list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
           + list_dot_product(c.c, c.c) AS d2
  FROM emb e CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
                 AS rn
        FROM dist)
  WHERE rn = 1
)
SELECT a.cluster, CAST(u.dim - 1 AS INT) AS dim,
       round(avg(e.v[u.dim]), 6) AS centroid,
       CAST(count(*) AS BIGINT) AS n_members
FROM assigned a
JOIN emb e USING (vec_id)
CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) u
GROUP BY a.cluster, u.dim
ORDER BY cluster, dim
"""


@query("kmeans_assign_update", oracle=_KMEANS_ORACLE)
def q_kmeans_assign_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's iteration of k-means over the embedding corpus:
    broadcast the k seed centroids (vec_id 0..7), assign every vector to
    its nearest centroid (squared L2 via the dot-product identity — one
    ``aggregate`` over the zipped arrays), and emit the updated centroids
    as flat (cluster, dim, centroid, n_members) rows.

    Distances use ‖x‖² − 2·x·c + ‖c‖² so both engines sum in the same
    array order; the argmin tie-breaks on cluster id. Running the full
    algorithm is this same DataFrame shape in a driver loop with a
    convergence test — each iteration is one broadcast + one k×d-cardinality
    agg, nothing driver-side but the k×d centroid matrix."""
    emb = _emb_double(load_table(spark, sf_dir, "embeddings"))
    cent = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    dist = emb.join(F.broadcast(cent)).select(
        "vec_id",
        "cluster",
        "v",
        (
            dot(F.col("v"), F.col("v"))
            - 2 * dot(F.col("v"), F.col("c"))
            + dot(F.col("c"), F.col("c"))
        ).alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    assigned = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster", "v")
    )
    return (
        assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(
            F.round(F.avg("val"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(F.col("cluster"), F.col("dim").cast("int"), "centroid", "n_members")
        .orderBy("cluster", "dim")
    )


# --- Content-defined chunking ------------------------------------------
# Boundary at position p iff the 4-char polynomial hash
#   ascii(t[p])*31^3 + ascii(t[p+1])*31^2 + ascii(t[p+2])*31 + ascii(t[p+3])
# is ≡ 0 (mod 61). Pure integer math → identical in any engine; the mod
# picks an expected chunk length of ~61 chars, like a Rabin-fingerprint
# CDC with a 6-bit mask.
_CDC_BOUNDARY = (
    "ascii(substring({t}, p, 1)) * 29791 + ascii(substring({t}, p + 1, 1)) * 961"
    " + ascii(substring({t}, p + 2, 1)) * 31 + ascii(substring({t}, p + 3, 1))"
)

_CDC_ORACLE = f"""
SELECT doc_id,
       CAST(CASE WHEN len(text) >= 4 THEN len(list_filter(
              generate_series(1, len(text) - 3),
              p -> ({_CDC_BOUNDARY.format(t='text')}) % 61 = 0))
            ELSE 0 END AS BIGINT) AS n_boundaries,
       CAST(len(text) AS BIGINT) AS n_chars
FROM documents
ORDER BY doc_id
"""


def _cdc_batches(it):
    """Arrow-batched boundary counter: per doc, one vectorized pass over
    the codepoint array (4 shifted multiplies + a mod), no per-position
    Python. Matches the oracle's integer polynomial exactly."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        texts = pdf["text"].tolist()
        n_b = np.zeros(len(texts), dtype=np.int64)
        n_c = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            n = len(t)
            n_c[i] = n
            if n >= 4:
                codes = np.fromiter(map(ord, t), np.int64, n)
                h = (
                    codes[:-3] * 29791
                    + codes[1:-2] * 961
                    + codes[2:-1] * 31
                    + codes[3:]
                )
                n_b[i] = int((h % 61 == 0).sum())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "n_boundaries": n_b, "n_chars": n_c}
        )


@query("content_defined_chunks", oracle=_CDC_ORACLE)
def q_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries): count the
    positions where the 4-gram polynomial hash hits the 1/61 mask. Unlike
    fixed-size chunking, an insertion early in a document only moves
    boundaries locally — the CDC property that makes chunk-level dedup
    robust to edits.

    Implementation is a vectorized ``mapInPandas`` (numpy rolling
    polynomial over the codepoint array). The declarative alternative — a
    higher-order ``filter`` over ``sequence(1, len-3)`` with 4
    ``substring`` calls per position — is expressible but measured ~30×
    slower (11.4 s vs 0.4 s at sf0.1): per-position interpreted expression
    evaluation is exactly the 'UDFs are the slow path' tradeoff INVERTED,
    the case where Arrow-batched numpy beats non-codegen HOF expressions.
    Still map-only: only (doc_id, n_boundaries, n_chars) leaves the
    executor and the scan prunes to two columns."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = "doc_id bigint, n_boundaries bigint, n_chars bigint"
    return docs.mapInPandas(_cdc_batches, out_schema).orderBy("doc_id")


# --- Character-entropy quality score -----------------------------------
# Shannon entropy (nats) of the document's distribution over
# [a-z], space, and "other" (28 symbols). Low entropy flags
# degenerate/repetitive text; a cheap perplexity proxy that needs no
# model. Counting via length-difference after replace() keeps it one
# per-row projection: no explode, no shuffle.
_ENTROPY_SYMS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]


def _entropy_counts_sql(quote: str) -> str:
    reps = ", ".join(
        f"len({{t}}) - len(replace({{t}}, {quote}{s}{quote}, ''))"
        for s in _ENTROPY_SYMS
    )
    return f"[{reps}]"


_ENTROPY_ORACLE = f"""
WITH c AS (
  SELECT doc_id, lower(text) AS t, len(text) AS n,
         {_entropy_counts_sql("'").format(t="lower(text)")} AS known
  FROM documents
), k AS (
  SELECT doc_id, n, list_append(known, n - list_sum(known)) AS counts
  FROM c
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       round(-list_sum(list_transform(counts,
              x -> CASE WHEN x > 0 THEN (x::DOUBLE / n) * ln(x::DOUBLE / n)
                   ELSE 0 END)), 4) AS char_entropy
FROM k
WHERE n > 0
ORDER BY doc_id
"""


def _entropy_batches(it):
    """Arrow-batched entropy: bincount the lowercased codepoints, pick the
    27 known symbols, fold the remainder into 'other'. Counts are exact
    integers; only the final p·ln p is float, matching the oracle's math.
    Summation mirrors the oracle's list order (a..z, space, other) so the
    double accumulation is bit-identical."""
    import numpy as np
    import pandas as pd

    sym_codes = np.array([ord(s) for s in _ENTROPY_SYMS], dtype=np.int64)
    for pdf in it:
        texts = pdf["text"].tolist()
        ent = np.zeros(len(texts), dtype=np.float64)
        n_c = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            n = len(t)
            n_c[i] = n
            if n == 0:
                continue
            codes = np.fromiter(map(ord, t.lower()), np.int64, n)
            bc = np.bincount(codes[codes < 256], minlength=256)
            known = bc[sym_codes]
            counts = np.append(known, n - int(known.sum()))
            h = 0.0
            for c in counts:  # fixed 28-term fold, same order as the oracle
                if c > 0:
                    p = c / n
                    h += p * np.log(p)
            ent[i] = -h
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_chars": n_c,
                "char_entropy": np.round(ent, 4),
            }
        )


@query("char_entropy_quality", oracle=_ENTROPY_ORACLE)
def q_char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-entropy quality score over a fixed 28-symbol
    alphabet (a-z, space, other) — a model-free perplexity proxy that
    flags degenerate/repetitive text. Vectorized ``mapInPandas``
    (codepoint bincount per doc): the declarative 28-replace-expression
    alternative re-scans the text 28 times per row and measured ~10×
    slower at sf0.1. Map-only, two-column scan, no shuffle."""
    # r19 note: a spread_fanout before the mapInPandas was tried and
    # REVERTED — the vectorized bincount is ~1 s total here, under the
    # exchange cost (kill-switch A/B min 1.08 s unspread vs 1.16 s).
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    out_schema = "doc_id bigint, n_chars bigint, char_entropy double"
    return docs.mapInPandas(_entropy_batches, out_schema).orderBy("doc_id")


# --- N-gram-overlap decontamination ------------------------------------
# The GPT-3/Dolma method (vs `benchmark_decontamination`'s phrase
# containment): a training doc is contaminated iff it shares at least one
# 8-token gram with the benchmark set (here: the 'src0' source plays the
# benchmark; everything else is the training corpus).
_NGRAM_DECON_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), g AS (
  SELECT doc_id, source,
         array_to_string(list_slice(t, i, i + 7), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
), bench AS (
  SELECT DISTINCT gram FROM g WHERE source = 'src0'
), train_g AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0'
), hits AS (
  SELECT doc_id, count(*) AS n FROM train_g JOIN bench USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared_grams,
       coalesce(h.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


@query("ngram_overlap_decontamination", oracle=_NGRAM_DECON_ORACLE)
def q_ngram_overlap_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by 8-token-gram overlap — the method the
    GPT-3/Dolma pipelines use (exact n-gram collision against the eval
    set), complementing the phrase-containment variant. Gram sets are
    built doc-locally (split → sequence → transform → explode, distinct
    per doc); the collision join keys on the gram string and the BENCHMARK
    side is broadcast — eval sets are tiny next to a training corpus, so
    the corpus never shuffles on gram. Per-doc hit counts come back to the
    doc list via a left join on doc_id (AQE broadcasts the aggregated
    side)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.when(
        F.size(toks) >= 8,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 8),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 8)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Collide on the 8-byte xxhash64 of the gram, not the gram string:
    # distinct/join keys shrink ~6× (8 bytes vs a ~50-byte 8-token string),
    # which is most of this query's shuffle volume. A cross-gram hash
    # collision (2^-64 per pair) could overcount one doc's hit count; at
    # corpus scale that expected error is orders of magnitude below the
    # contamination threshold anyone filters at.
    # The 8-token gram construction + hash is O(tokens) per row off a
    # 1-split scan — re-spread so it uses every core (no-op when wide).
    from ..operators.parallelism import spread_fanout

    g = (
        spread_fanout(docs.select("doc_id", "source", "text"))
        .select("doc_id", "source", F.explode(grams).alias("gram_s"))
        .select("doc_id", "source", F.xxhash64("gram_s").alias("gram"))
    )
    bench = g.filter(F.col("source") == "src0").select("gram").distinct()
    train_g = (
        g.filter(F.col("source") != "src0").select("doc_id", "gram").distinct()
    )
    hits = (
        train_g.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        docs.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shared_grams"),
            (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --- Multi-class PII scan ----------------------------------------------
# Breadth companion to text_redaction (emails only): count and mask
# email / phone / IPv4 occurrences per doc. The corpus has no organic
# PII, so each class is injected deterministically first (docs ≡ 0 mod 5
# / mod 7 / mod 11 get one synthetic instance) — the expected match set
# is then exact. All three patterns sit in the Java-regex ∩ RE2 dialect
# subset.
_PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' mail user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-0199' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25' ELSE '' END
           AS text2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{_PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text2, '{_PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text2, '{_PII_IP_RE}')) AS BIGINT)    AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text2,
             '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PII_PHONE_RE}', '<PHONE>', 'g'),
             '{_PII_IP_RE}', '<IP>', 'g')) AS scrubbed_md5
FROM t
ORDER BY doc_id
"""


@query("pii_scan_counts", oracle=_PII_ORACLE)
def q_pii_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class PII scan + scrub (email, phone, IPv4): per-doc class
    counts and the md5 of the fully-scrubbed text, so any masking
    difference in any class hash-mismatches. Chained regexp_replace in
    one narrow projection — one text pass per class, no shuffle; classes
    are scrubbed most-specific-first so earlier masks can't destroy later
    matches."""
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" mail user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".25"),
            ),
        ).otherwise(F.lit("")),
    )
    t = docs.select("doc_id", injected.alias("text2"))
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text2", _PII_EMAIL_RE, "<EMAIL>"),
            _PII_PHONE_RE,
            "<PHONE>",
        ),
        _PII_IP_RE,
        "<IP>",
    )
    n = lambda pat, name: (  # noqa: E731
        F.size(F.regexp_extract_all("text2", F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(name)
    )
    return t.select(
        "doc_id",
        n(_PII_EMAIL_RE, "n_emails"),
        n(_PII_PHONE_RE, "n_phones"),
        n(_PII_IP_RE, "n_ips"),
        F.md5(scrub).alias("scrubbed_md5"),
    ).orderBy("doc_id")


# --- Deterministic weighted reservoir sampling (A-Res) -----------------
# Efraimidis–Spirakis: key = u^(1/w) (equivalently rank by -ln(u)/w);
# the top-k keys are a weighted sample without replacement. With the
# seeded-md5 uniform the "reservoir" is fully deterministic and
# engine-reproducible — the distributed form is a per-partition top-k
# merged by TakeOrdered, never a global sort of the corpus.
_WEIGHTED_SAMPLE_ORACLE = """
WITH u AS (
  SELECT doc_id, n_chars,
         greatest(
           ('0x' || substr(md5('ares' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
           1) / 4294967296.0 AS unif
  FROM documents
  WHERE n_chars > 0
), keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         round(-ln(unif) / n_chars, 10) AS ares_key
  FROM u
)
SELECT doc_id, n_chars, ares_key
FROM keyed
ORDER BY ares_key, doc_id
LIMIT 50
"""


@query("weighted_sample_ares", oracle=_WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res),
    weights = document length: rank every doc by -ln(u)/w with the
    seeded-md5 uniform and keep the 50 smallest keys. Deterministic and
    bit-reproducible across engines/partitionings (the same auditability
    convention as stratified_sample); the plan is a per-partition top-k
    heap merged on the driver (TakeOrderedAndProject), NOT a global sort
    — the only shape that survives a 100 TB corpus for a 50-row sample."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # greatest(conv, 1): the raw md5-prefix integer lives in [0, 2^32);
    # clamping to >= 1 keeps u in (0, 1] so -ln(u) is never null (a null
    # key would sort first and steal a sample slot) — clamped identically
    # in the oracle and the library twin (operators/sampling.py, r17
    # ADVICE); every non-pathological key is bit-unchanged.
    unif = (
        F.greatest(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ares"), F.col("doc_id").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("double"),
            F.lit(1.0),
        )
        / F.lit(4294967296.0)
    )
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round(-F.log(unif) / F.col("n_chars"), 10).alias("ares_key"),
    )
    return keyed.orderBy("ares_key", "doc_id").limit(50)


# --- Sentence-level text stats -----------------------------------------
_SENTENCE_ORACLE = r"""
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[.!?]+'),
                     x -> len(trim(x)) > 0) AS sents
  FROM documents
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       CAST(CASE WHEN len(sents) > 0
            THEN list_max(list_transform(sents, x -> len(trim(x))))
            ELSE 0 END AS BIGINT) AS max_sentence_chars,
       round(CASE WHEN len(sents) > 0
             THEN list_sum(list_transform(sents, x -> len(trim(x))))::DOUBLE
                  / len(sents)
             ELSE 0.0 END, 4) AS mean_sentence_chars
FROM s
ORDER BY doc_id
"""


@query("sentence_stats", oracle=_SENTENCE_ORACLE)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (the doc-structure signal quality
    filters read: run-on text, fragment spam): split on [.!?]+ runs,
    whitespace-trimmed non-empty segments, per-doc count and length
    moments. Array higher-order functions only — per-row, no explode, no
    shuffle; segmentation is intentionally the regex-boundary definition
    shared exactly by both engines."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.split(F.col("text"), r"[.!?]+"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    lens = F.transform(sents, lambda x: F.length(F.trim(x)))
    n = F.size(sents)
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_sentences"),
        F.when(n > 0, F.array_max(lens)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("max_sentence_chars"),
        F.round(
            F.when(
                n > 0,
                F.aggregate(lens, F.lit(0), lambda a, x: a + x).cast("double") / n,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_sentence_chars"),
    ).orderBy("doc_id")


# --- Temperature-scaled language mix ------------------------------------
# The mBERT/XLM-R multilingual rebalancing rule: sampling share
# q_l ∝ p_l^alpha (alpha=0.3) flattens the language distribution so
# low-resource languages are upsampled without swamping the head. Output
# per language: raw token share, temperature share, and the effective
# per-doc sampling multiplier q_l/p_l a weighted dataloader consumes.

_TOKS3 = r"string_split_regex(lower(trim(text)), '\s+')"

_TEMP_MIX_ORACLE = f"""
WITH lt AS (
  SELECT lang, CAST(sum(len({_TOKS3})) AS DOUBLE) AS lang_tokens
  FROM documents GROUP BY lang
), p AS (
  SELECT lang, lang_tokens,
         lang_tokens / sum(lang_tokens) OVER () AS p_raw,
         pow(lang_tokens / sum(lang_tokens) OVER (), 0.3) AS pw
  FROM lt
)
SELECT lang,
       CAST(lang_tokens AS BIGINT) AS lang_tokens,
       round(p_raw, 6) AS p_raw,
       round(pw / sum(pw) OVER (), 6) AS q_temp,
       round((pw / sum(pw) OVER ()) / p_raw, 6) AS multiplier
FROM p ORDER BY lang
"""


@query("temperature_mix_alpha", oracle=_TEMP_MIX_ORACLE)
def q_temperature_mix_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) language-sampling mix. One agg down
    to O(languages) rows; normalizations are windows over those few rows —
    at 100 TB the only full-data pass is the token-count aggregate (a
    map-side-combined sum per language)."""
    toks_n = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("double")
    lt = (
        load_table(spark, sf_dir, "documents")
        .select("lang", toks_n.alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").alias("lang_tokens"))
    )
    wall = Window.partitionBy()
    p_raw = F.col("lang_tokens") / F.sum("lang_tokens").over(wall)
    p = lt.select(
        "lang",
        "lang_tokens",
        p_raw.alias("p_raw"),
        F.pow(p_raw, F.lit(0.3)).alias("pw"),
    )
    q_temp = F.col("pw") / F.sum("pw").over(wall)
    return p.select(
        "lang",
        F.col("lang_tokens").cast("bigint").alias("lang_tokens"),
        F.round("p_raw", 6).alias("p_raw"),
        F.round(q_temp, 6).alias("q_temp"),
        F.round(q_temp / F.col("p_raw"), 6).alias("multiplier"),
    ).orderBy("lang")


# --- Fixed-quota per-stratum sampling -----------------------------------
# "Exactly n docs per language", reproducibly: rank within each language
# by the seeded-md5 of the doc id (the repo's rand()-free uniform) and
# keep rank <= n. Unlike the rate-based stratified sampler this guarantees
# the exact quota even for tiny strata.

_QUOTA_N = 40

_QUOTA_ORACLE = f"""
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':quota'), doc_id) AS rk
  FROM documents)
WHERE rk <= {_QUOTA_N}
ORDER BY lang, rk
"""


@query("fixed_quota_sample", oracle=_QUOTA_ORACLE)
def q_fixed_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample (n=40 per language), bit-reproducible
    across engines/partitionings via seeded-md5 ordering. The rank window
    sorts WITHIN each language partition only; at 100 TB quota sampling of
    a huge stratum switches to the two-pass threshold form (sample the
    hash space, refine the cutoff), same keys, no global sort."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    u = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":quota")))
    w = Window.partitionBy("lang").orderBy(u, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _QUOTA_N)
        .orderBy("lang", "rk")
    )


# --- Per-source score calibration ---------------------------------------
# Cross-source comparability: a raw quality metric (here: doc length) is
# not comparable across sources with different length distributions, so
# curation thresholds are set on the WITHIN-SOURCE percentile instead.

_CALIB_ORACLE = """
SELECT doc_id, source,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id), 6) AS len_pctile
FROM documents
ORDER BY doc_id
"""


@query("quality_percentile_by_source", oracle=_CALIB_ORACLE)
def q_quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile calibration of a per-doc metric
    (percent_rank over the source partition; deterministic tiebreak by
    doc_id). Scale: one shuffle on source + in-partition sort — the
    standard score-normalization step before cross-source filtering."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.round(F.percent_rank().over(w), 6).alias("len_pctile"),
        )
        .orderBy("doc_id")
    )


# --- Bigram-LM perplexity filter ----------------------------------------
# The CCNet-style quality gate: score every document by a language model
# trained on a trusted slice (here: source 'src0'), filter the tail. The
# LM is an add-1-smoothed word-bigram model; the per-bigram NLL is
# ln(c(w1)+V) - ln(c(w1,w2)+1) — both log arguments are integers, so the
# doubles are bit-identical in any engine and only the (stable at 1e-6)
# summation order differs.

_BIGRAM_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS3} AS t FROM documents
), big AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
           AS bg
  FROM toks
), tr_big AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM big
  WHERE source = 'src0' GROUP BY bg
), tr_uni AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
    SELECT string_split(bg, ' ')[1] AS w1 FROM big WHERE source = 'src0')
  GROUP BY w1
), v AS (
  SELECT CAST(count(DISTINCT u) AS BIGINT) AS vocab FROM (
    SELECT unnest(t) AS u FROM toks WHERE source = 'src0')
), scored AS (
  SELECT b.doc_id,
         ln(coalesce(u.c1, 0) + v.vocab) - ln(coalesce(tb.c12, 0) + 1) AS nll
  FROM big b
  LEFT JOIN tr_big tb ON tb.bg = b.bg
  LEFT JOIN tr_uni u ON u.w1 = string_split(b.bg, ' ')[1]
  CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nll), 6) AS avg_nll
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query("bigram_lm_perplexity", oracle=_BIGRAM_LM_ORACLE)
def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood against a model
    trained on the trusted 'src0' slice — the perplexity-filtering step of
    a pretraining pipeline. Scale shape: the LM itself is O(vocab²)
    bounded and BROADCAST into the scoring pass (count tables + the
    scalar vocab size), so the corpus is scanned once and never shuffled
    on token keys for scoring; the only corpus-sized shuffle is the final
    per-doc aggregate."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", toks.alias("t"))
    bigrams = F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))")
    big = docs.select("doc_id", "source", F.explode(bigrams).alias("bg"))
    train = big.filter(F.col("source") == "src0")
    tr_big = train.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    tr_uni = (
        train.select(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode("t").alias("u"))
        .agg(F.countDistinct("u").alias("vocab"))
    )
    scored = (
        big.withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(tr_big), "bg", "left")
        .join(F.broadcast(tr_uni), "w1", "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                F.log(F.coalesce("c1", F.lit(0)) + F.col("vocab"))
                - F.log(F.coalesce("c12", F.lit(0)) + F.lit(1))
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )
