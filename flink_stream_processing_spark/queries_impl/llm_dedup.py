"""Near-duplicate detection queries (LLM extension).

Recall gating (round-2 upgrade): the MinHash-LSH path now registers a FULL
DuckDB oracle — the exact shingle-Jaccard pairs at the same threshold. The
LSH verify stage computes exact Jaccard on candidates, so precision is 1.0
by construction; a hash match against the exact-pairs oracle therefore
asserts recall == 1.0 at the operating point (32 perms, 16 bands × 2 rows,
S-curve midpoint 0.25, verify threshold 0.5 — chosen so every pair at or
above threshold has candidate-inclusion probability ≥ 0.99, and measured
recall on the test corpora is exactly 1.0; see tests/test_recall.py for the
brute-force gates). SimHash remains rows-only in CORRECTNESS (xxhash64 has
no DuckDB equivalent) but is gated in tests against brute-force Hamming
pairs over the same signatures, where pigeonhole makes recall exactly 1.0
for max_hamming <= 3 with 4 segments.

Incremental dedup: the new-batch-vs-persisted-store operation. The batch
split is deterministic (doc_id % 10 == 0 is "today's batch") so DuckDB can
mirror it; exact incremental dedup is fully oracle-checked, and the
incremental MinHash path is oracle-checked the same way as the batch LSH
path (exact corpus×batch pairs at the threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    band_hashes,
    exact_fingerprint_store,
    incremental_exact_dedup,
    incremental_minhash_near_dups,
    jaccard_pairs,
    minhash_near_dups,
    minhash_signatures,
    shingle_array,
    simhash,
    simhash_near_dups,
    word_shingles,
)
from ..queries import query
from ..sources.batch import load_table

# Exact word-3-gram Jaccard (CTE chain in _shared_oracles — also the
# recall oracle base for llm_dedup2 / llm_pipeline5): top-20 most similar
# pairs (deterministic order: jaccard desc, then pair ids). DuckDB
# mirrors the same shingle construction.
from ._shared_oracles import JACCARD_CTES as _JACCARD_CTES  # noqa: E402

_JACCARD_ORACLE = (
    _JACCARD_CTES
    + """
SELECT doc_a, doc_b, jaccard FROM jac
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""
)

# All exact pairs at the LSH operating threshold — the recall oracle for the
# approximate path. (Data note: the corpus has planted dups at Jaccard >=
# 0.75 and background pairs at ~0.1, so any threshold in (0.15, 0.75)
# selects the same pair set; 0.5 is the documented operating point.)
_JACCARD_THRESHOLD_ORACLE = (
    _JACCARD_CTES
    + """
SELECT doc_a, doc_b, jaccard FROM jac
WHERE jaccard >= 0.5
ORDER BY doc_a, doc_b
"""
)


@query("near_dup_topk_pairs", oracle=_JACCARD_ORACLE)
def q_near_dup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(load_table(spark, sf_dir, "documents"))
    return (
        jaccard_pairs(sh)
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


@query("minhash_lsh_near_dups", oracle=_JACCARD_THRESHOLD_ORACLE)
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: shingle -> 32-perm MinHash -> 16-band LSH -> exact verify
    at Jaccard >= 0.5. The oracle is the EXACT pair set at the same
    threshold, so a hash match certifies LSH recall == 1.0 (precision is
    1.0 by construction of the verify stage)."""
    return minhash_near_dups(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    ).orderBy("doc_a", "doc_b")


def _simhash_sig_ctes() -> str:
    """DuckDB CTEs computing the EXACT same 64-bit SimHash signatures as the
    Spark md5-token-hash pipeline. Token hash = md5 hex chars 1-8 (bits
    32-63) and 9-16 (bits 0-31), kept as two 32-bit halves because DuckDB
    errors on shifting into bit 63; per-bit ±1 sums are 64 generated
    aggregate expressions, and the pack step adds bit 63 as the min-long
    literal (its only representable form)."""
    bit = lambda j: f"((h2 >> {j}) & 1)" if j < 32 else f"((h1 >> {j - 32}) & 1)"  # noqa: E731
    sums = ",\n         ".join(
        f"sum(case when {bit(j)} = 1 then 1 else -1 end) AS s{j}" for j in range(64)
    )
    pos = " + ".join(f"(case when s{j} > 0 then {1 << j} else 0 end)" for j in range(63))
    pack = (
        f"(({pos})::BIGINT"
        " + (case when s63 > 0 then (-9223372036854775807 - 1) else 0 end))::BIGINT"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id,
         cast('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h1,
         cast('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS h2
  FROM toks
),
sums AS (
  SELECT doc_id, {sums}
  FROM th GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, {pack} AS simhash FROM sums
)
"""


_SIMHASH_SIG_ORACLE = _simhash_sig_ctes() + "SELECT doc_id, simhash FROM sigs ORDER BY doc_id"

_SIMHASH_PAIRS_ORACLE = (
    _simhash_sig_ctes()
    + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""
)


@query("simhash_signatures", oracle=_SIMHASH_SIG_ORACLE)
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures with the md5 token hash — bit-identical to the
    DuckDB oracle's 64 generated per-bit sums, so the full signature
    computation is hash-checked (the xxhash64 default is the cheaper scale
    path; its machinery is identical and unit-tested)."""
    return simhash(
        load_table(spark, sf_dir, "documents"), token_hash="md5"
    ).orderBy("doc_id")


@query("simhash_near_dups", oracle=_SIMHASH_PAIRS_ORACLE)
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups at the pigeonhole-complete radius (Hamming <= 3
    with 4 16-bit segments — recall is exactly 1.0 vs brute force by
    construction; the round-1 max_hamming=16 call sat outside that bound
    and silently missed distance-4..16 pairs). Oracle = brute-force
    all-pairs Hamming over the SAME (DuckDB-recomputed) signatures, so a
    hash match certifies both the signature computation and bucketed
    recall."""
    return simhash_near_dups(
        load_table(spark, sf_dir, "documents"), max_hamming=3, token_hash="md5"
    ).orderBy("doc_a", "doc_b")


def _split_batch(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic corpus/new-batch split mirrored in the oracles:
    doc_id % 10 == 0 is the incoming batch, the rest is the corpus."""
    return docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)


_INCR_EXACT_ORACLE = """
WITH store AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id, md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 = 0
),
novel AS (
  SELECT b.doc_id, b.fingerprint FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fingerprint = b.fingerprint)
)
SELECT min(doc_id) AS doc_id, fingerprint
FROM novel GROUP BY fingerprint
ORDER BY doc_id
"""


@query("incremental_exact_dedup", oracle=_INCR_EXACT_ORACLE)
def q_incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch exact dedup against the persisted corpus fingerprint store:
    the anti-join every real pipeline runs daily. Survivors = batch docs
    whose fingerprint is not in the store, min-id per in-batch group."""
    corpus, batch = _split_batch(load_table(spark, sf_dir, "documents"))
    store = exact_fingerprint_store(corpus)
    return incremental_exact_dedup(batch, store).orderBy("doc_id")


_INCR_MINHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
ORDER BY doc_a, doc_b
"""


@query("incremental_minhash_near_dups", oracle=_INCR_MINHASH_ORACLE)
def q_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup matches of the new batch against the persisted MinHash band
    store (bands written once for the corpus; the daily join carries only
    O(batch × bands) keys). Oracle = exact corpus×batch Jaccard pairs at
    the threshold, so a hash match certifies incremental recall == 1.0."""
    corpus, batch = _split_batch(load_table(spark, sf_dir, "documents"))
    # Materialize the corpus shingle arrays once: in production BOTH store
    # tables (bands + shingle arrays) are persisted; this checkpoint stands
    # in for that persistence so the corpus text is scanned exactly once.
    corpus_arr = shingle_array(corpus).select(
        "doc_id", F.array_distinct("sh_arr").alias("sh_arr")
    ).localCheckpoint(eager=True)
    store = band_hashes(minhash_signatures(corpus_arr))
    return incremental_minhash_near_dups(
        batch, store, corpus_arr, threshold=0.5
    ).orderBy("doc_a", "doc_b")


# Connected components over the exact near-dup pair set: the oracle walks
# the transitive closure with a RECURSIVE CTE (min label = component rep),
# the Spark side runs distributed min-label propagation over the
# recall-certified LSH pairs — so the hash match gates pair recall AND the
# iterative clustering in one check.
_CLUSTER_ORACLE = (
    _JACCARD_CTES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
, pe AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
e AS (SELECT doc_a AS a, doc_b AS b FROM pe UNION SELECT doc_b, doc_a FROM pe),
nodes AS (SELECT DISTINCT a AS n FROM e),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n)
SELECT doc_id, cluster_rep,
       CAST(count(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
FROM cc ORDER BY doc_id
"""
)


@query("near_dup_clusters", oracle=_CLUSTER_ORACLE)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup CLUSTERS: LSH pairs (recall-certified) fed into
    distributed min-label-propagation connected components; each clustered
    doc maps to its component's min-id representative plus the component
    size. This is the step pairwise dedup output needs when duplicates
    chain (A~B~C without A~C) — keep exactly one doc per transitive group.
    The oracle computes the transitive closure of the EXACT pair set with
    a recursive CTE, gating the LSH recall and the iterative clustering
    together."""
    from pyspark.sql.window import Window

    from ..operators.dedup import connected_components

    pairs = minhash_near_dups(load_table(spark, sf_dir, "documents"), threshold=0.5)
    cc = connected_components(pairs)
    w = Window.partitionBy("cluster_rep")
    return (
        cc.select(
            F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_rep")
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .orderBy("doc_id")
    )


_NGRAM_SPAN_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
w AS (
  SELECT doc_id, unnest(range(0, greatest(n_tokens - 20 + 1, 0))) AS s, toks
  FROM b
),
h AS (
  SELECT doc_id, s, md5(array_to_string(toks[s+1:s+20], ' ')) AS h FROM w
),
c AS (SELECT doc_id, s, count(*) OVER (PARTITION BY h) AS cnt FROM h),
d AS (SELECT doc_id, s FROM c WHERE cnt >= 2),
i1 AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER win IS NULL OR s - lag(s) OVER win > 20
              THEN 1 ELSE 0 END AS new_isl
  FROM d WINDOW win AS (PARTITION BY doc_id ORDER BY s)
),
i2 AS (
  SELECT doc_id, s,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM i1
),
sp AS (
  SELECT doc_id, isl_id, count(*) AS dup_w, max(s) + 20 - min(s) AS span_len
  FROM i2 GROUP BY doc_id, isl_id
),
pd AS (
  SELECT doc_id, CAST(sum(dup_w) AS BIGINT) AS dup_windows,
         CAST(sum(span_len) AS BIGINT) AS dup_tokens
  FROM sp GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       CAST(greatest(b.n_tokens - 20 + 1, 0) AS BIGINT) AS n_windows,
       coalesce(pd.dup_windows, 0) AS dup_windows,
       coalesce(pd.dup_tokens, 0) AS dup_tokens,
       round(CAST(coalesce(pd.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 6)
         AS dup_token_frac
FROM b LEFT JOIN pd USING (doc_id)
ORDER BY doc_id
"""


@query("duplicate_ngram_spans", oracle=_NGRAM_SPAN_ORACLE)
def q_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup: per-doc merged coverage of 20-token
    runs that occur >= 2 times anywhere in the corpus (the Lee et al.
    suffix-array duplicate definition, realized as hashed sliding windows
    + one analytic count + an island merge — see
    operators/dedup.duplicate_ngram_spans for the 100 TB plan shape).
    Finds repeated boilerplate INSIDE otherwise-distinct documents, which
    whole-doc MinHash/SimHash structurally cannot."""
    from ..operators.dedup import duplicate_ngram_spans

    return duplicate_ngram_spans(load_table(spark, sf_dir, "documents"))
