"""Store MAINTENANCE for the incremental dedup families — the write side
of the daily pipeline (r15 queue item (b), prepared in r14).

The incremental read sides (``incremental_exact_dedup``,
``incremental_minhash_near_dups``, ``incremental_strip_new_docs``) all
probe a persisted key store that some earlier run wrote. This module is
that earlier run — all three maintenance verbs: APPEND (novel keys
only; plus the refcount-representation append), COMPACT (bucket routing
+ the per-bucket audit report), and DELETE (takedown tombstones with
content expansion and sharing-protected refcount purges — see the
tombstone section below), across the exact, span, MinHash, and IVF
store families.

100 TB design: the store lives as a parquet/Delta table hash-bucketed on
the key (``exact_fingerprint_store``'s contract, one level up). The
append writes ONLY delta rows, routed to their buckets; compaction
rewrites per-bucket files merging the small daily appends. Nothing here
is all-pairs: the delta is one anti-join on the key (the same
bucket-local join shape as the probe side), and the report shuffles only
(bucket_id, is_new) pairs with map-side partial aggregation. Corpus TEXT
is consumed exactly once, when keys are extracted — the maintenance plan
never rescans it.

Key contract: keys are md5 hex digests (32 chars) — both store families
already use them (``exact_fingerprint_store`` at doc granularity,
``span_hash_store`` at window granularity), and the bucket id derives
from the first 8 hex chars, so bucket routing costs no second hash and
is byte-identical in Spark and DuckDB (``('0x' || substr(key,1,8))
::BIGINT % B`` / ``conv(substring(key,1,8),16,10) % B``).

Registration state (r17): ``fingerprint_store_compaction``,
``span_store_compaction``, ``minhash_store_append``,
``daily_ingest_cycle`` (r15), ``ivf_store_append``,
``ivf_refreshed_centroids`` (r16 flip), and the tombstone pair
``span_store_tombstones`` / ``fingerprint_store_tombstones`` (r17 flip)
are all registered (``@query`` + queries.py import + QUERY_LEDGER.json
rows); all are additionally gated by tests/test_store_maintenance.py
through the same assert_matches_oracle harness the driver mirrors.

Reference parity note: the reference pipeline (StreamJob.java) keeps no
persisted dedup state at all — this family is part of the LLM-pipeline
extension (SURVEY.md "training-data pipeline" mandate), modeled on the
suffix-array/fingerprint store maintenance described in "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022) §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_fingerprint_store
from ..queries import query
from ..sources.batch import load_table
from ..operators.text import tokens_col
from ._span_shared import (  # noqa: F401  (re-exports: see the moved-note comments)
    _IVF_ASSIGN_ORACLE,
    _SPAN_W,
    _SPAN_WINDOW_CTES,
    _TOMBSTONE_RESIDUE,
)

# Module-object binding, not attribute imports: this module is REGISTERED
# (queries.py imports it), so when web_dedup_stream is the process's
# first import this module executes while web_dedup_stream is partially
# initialized — its functions (span_hash_store et al.) must resolve at
# call time, after the cycle unwinds (see _span_shared's docstring).
from . import web_dedup_stream as _wds

# Bucket count for the compaction report. 8 keeps every bucket populated
# at sf0.001 (the smallest driver SF) so the report's shape is
# SF-independent; a production table would use O(thousands) — the
# arithmetic is identical, only the literal changes (interpolated into
# the oracles below so the two engines cannot drift).
_N_BUCKETS = 8


def store_append_delta(store: DataFrame, batch_keys: DataFrame, key: str) -> DataFrame:
    """Novel keys of an ingest batch: the rows the daily append actually
    writes. One anti-join on the key — at 100 TB both sides are bucketed
    on it, so the join is bucket-local with no wide shuffle. The batch
    side is deduped first (a batch re-presenting a key twice must write
    it once)."""
    return batch_keys.select(key).distinct().join(
        store.select(key), key, "left_anti"
    )


def compacted_store(store: DataFrame, delta: DataFrame, key: str,
                    n_buckets: int = _N_BUCKETS) -> DataFrame:
    """The next store generation: carried ∪ delta, each key routed to its
    bucket, tagged with provenance. NO distinct here — the store is
    distinct by contract and the delta is anti-joined against it, so the
    union is distinct BY CONSTRUCTION and the extra shuffle would be pure
    waste (test-pinned by test_compacted_store_is_distinct). Output:
    (bucket_id, key..., is_new)."""
    tagged = store.select(key).withColumn("is_new", F.lit(False)).unionByName(
        delta.select(key).withColumn("is_new", F.lit(True))
    )
    bucket = (
        F.conv(F.substring(F.col(key), 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket_id")
    return tagged.select(bucket, key, "is_new")


def compaction_report(gen2: DataFrame) -> DataFrame:
    """Per-bucket audit row of a compaction run: how many keys each bucket
    carried over, gained, and now holds. Shuffles only (bucket_id,
    is_new) aggregates — partial map-side, final per bucket."""
    return gen2.groupBy("bucket_id").agg(
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_carried"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_new"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )


# --- planned registry name: fingerprint_store_compaction -------------------

FINGERPRINT_STORE_COMPACTION_ORACLE = f"""
WITH store AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 = 0
),
delta AS (
  SELECT fingerprint FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fingerprint = b.fingerprint)
),
gen2 AS (
  SELECT fingerprint, FALSE AS is_new FROM store
  UNION ALL
  SELECT fingerprint, TRUE AS is_new FROM delta
)
SELECT ('0x' || substr(fingerprint, 1, 8))::BIGINT % {_N_BUCKETS} AS bucket_id,
       CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_carried,
       CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(count(*) AS BIGINT) AS n_total
FROM gen2 GROUP BY bucket_id ORDER BY bucket_id
"""


@query("fingerprint_store_compaction", oracle=FINGERPRINT_STORE_COMPACTION_ORACLE)
def q_fingerprint_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily maintenance of the exact-dedup fingerprint store over the
    standard corpus/batch split (doc_id % 10 == 0 is the incoming batch —
    llm_dedup._split_batch's convention, mirrored in the oracle): build
    gen-1 from the corpus, compute the batch's append delta, and emit the
    per-bucket compaction report of gen-2. The gate certifies the full
    write path: key extraction, delta anti-join, bucket routing, and the
    carried/new/total arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    store = exact_fingerprint_store(corpus)
    delta = store_append_delta(store, exact_fingerprint_store(batch), "fingerprint")
    return compaction_report(
        compacted_store(store, delta, "fingerprint")
    ).orderBy("bucket_id")


# --- planned registry name: span_store_compaction --------------------------

# _SPAN_WINDOW_CTES (the t/b/w/h window-hash CTE prefix) moved to
# ._span_shared in r16: streaming_maintenance's oracles need it at
# module-import time too, and an attribute import from here would hit
# the partial-init ImportError when this module is the process's first
# import. Re-exported via the import at the top of this file so the
# oracle f-strings below and external importers are unchanged.

SPAN_STORE_COMPACTION_ORACLE = f"""
WITH {_SPAN_WINDOW_CTES},
store AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 <> 0),
batch AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 = 0),
delta AS (
  SELECT h FROM batch b2
  WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.h = b2.h)
),
gen2 AS (
  SELECT h, FALSE AS is_new FROM store
  UNION ALL
  SELECT h, TRUE AS is_new FROM delta
)
SELECT ('0x' || substr(h, 1, 8))::BIGINT % {_N_BUCKETS} AS bucket_id,
       CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_carried,
       CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(count(*) AS BIGINT) AS n_total
FROM gen2 GROUP BY bucket_id ORDER BY bucket_id
"""


def _tokenized(docs: DataFrame) -> DataFrame:
    return docs.select(F.col("doc_id"), tokens_col().alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )


@query("span_store_compaction", oracle=SPAN_STORE_COMPACTION_ORACLE)
def q_span_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same daily maintenance one level below document granularity:
    append the new batch's W-token window hashes to the persisted span
    store (``span_hash_store``) and report the gen-2 bucket histogram.
    This is the write side whose read side is ``incremental_strip_spans``
    — together they close the daily loop: strip the batch against gen-1,
    then append its (post-ingest) hashes so tomorrow's batch dedups
    against today's docs. Window hashes build DOC-LOCALLY
    (token_window_hashes); only 32-char hashes ever shuffle."""
    toks = _tokenized(load_table(spark, sf_dir, "documents"))
    corpus = toks.filter(F.col("doc_id") % 10 != 0)
    batch = toks.filter(F.col("doc_id") % 10 == 0)
    store = _wds.span_hash_store(corpus)
    delta = store_append_delta(store, _wds.span_hash_store(batch), "h")
    return compaction_report(compacted_store(store, delta, "h")).orderBy("bucket_id")


# --- planned registry name: minhash_store_append (r16 lookahead) ------------

MINHASH_STORE_APPEND_ORACLE = r"""
WITH store AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id, md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 = 0
),
novel AS (
  SELECT min(doc_id) AS doc_id FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fingerprint = b.fingerprint)
  GROUP BY fingerprint
),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE doc_id % 10 = 0
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
)
SELECT n.doc_id, CAST(count(*) AS BIGINT) AS n_shingles
FROM novel n JOIN sh ON n.doc_id = sh.doc_id
GROUP BY n.doc_id ORDER BY n.doc_id
"""


def minhash_store_append(batch: DataFrame, fingerprint_store: DataFrame):
    """The MinHash band store's daily append — the THIRD store family's
    write side (bands + shingle arrays, ``incremental_minhash_near_dups``'s
    two persisted tables). Append policy: EXACT-dedup survivors only — a
    byte-identical re-crawl must not grow the band store (its near-dup
    matches would be pure noise; the exact family already owns that case).
    Near-dup batch docs DO enter: the band store must know about every
    distinct document that entered the corpus, else a third copy of a
    near-dup pair would probe clean tomorrow.

    Returns (new_band_rows, new_shingle_arrs) — the rows the append writes
    to each table. Both derive from ONE shingle pass over the survivor
    docs; bands are O(survivors × 16) narrow rows (xxhash64 path, the
    scale fast-path — NOT oracle-expressible, so the band payload is
    law-pinned in tests by probe-equivalence against a from-scratch store,
    while the registered gate pins the survivor selection + shingle
    payload, which DuckDB can recompute exactly)."""
    from ..operators.dedup import (
        band_hashes,
        incremental_exact_dedup,
        minhash_signatures,
        shingle_array,
    )

    survivors = incremental_exact_dedup(batch, fingerprint_store).select("doc_id")
    # r19 note: a spread_fanout on shingle_array(batch) was tried and
    # REVERTED — the 1/10-corpus batch's shingle+fold work is too light to
    # pay for the inserted exchange (rotated A/B: 1.84 s unspread vs 2.16 s
    # spread at sf0.1).
    new_arrs = (
        shingle_array(batch)
        .join(survivors, "doc_id", "semi")
        .select("doc_id", F.array_distinct("sh_arr").alias("sh_arr"))
    )
    new_bands = band_hashes(minhash_signatures(new_arrs.select("doc_id", F.col("sh_arr"))))
    return new_bands, new_arrs


@query("minhash_store_append", oracle=MINHASH_STORE_APPEND_ORACLE)
def q_minhash_store_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate projection of the MinHash store append: which batch docs the
    maintenance run admits (exact-dedup survivors with >= 3 tokens — the
    shingle floor) and the distinct-shingle payload each writes to the
    array store. The band payload itself is xxhash64-based (no DuckDB
    twin); its correctness is pinned by the probe-equivalence law in
    tests/test_store_maintenance.py: the maintained band store must be
    indistinguishable, under incremental_minhash_near_dups, from a
    from-scratch store over corpus ∪ survivors."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    _, new_arrs = minhash_store_append(batch, exact_fingerprint_store(corpus))
    return new_arrs.select(
        "doc_id", F.size("sh_arr").cast("long").alias("n_shingles")
    ).orderBy("doc_id")


# --- planned registry name: daily_ingest_cycle (r16 lookahead) --------------

# The full daily loop as ONE gate: strip the batch against gen-1, then
# count what each ingested doc contributes to gen-2. The strip side is
# web_dedup_stream's _INCR_STRIP_ORACLE embedded VERBATIM as a derived
# table (nested WITH — imported, not retyped, so the two gates can never
# diverge on strip semantics); the append side recomputes window hashes
# over the text THAT ENTERS THE CORPUS (clean_text for affected docs,
# original text otherwise) and counts each doc's windows absent from
# gen-1. n_new_hashes is per-doc novelty VS THE STORE (batch-internal
# overlap deliberately not deduped here — attribution of a shared novel
# hash to one doc would be arbitrary; the global append itself stays
# set-distinct via store_append_delta).
def _daily_cycle_oracle() -> str:
    from ._span_shared import _INCR_STRIP_ORACLE

    return f"""
WITH strip AS ({_INCR_STRIP_ORACLE}),
{_SPAN_WINDOW_CTES},
store AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 <> 0),
batch_base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
           AS n_tokens,
         text
  FROM documents WHERE doc_id % 10 = 0
),
ingest AS (
  SELECT doc_id, clean_text AS txt FROM strip
  UNION ALL
  SELECT doc_id, lower(trim(text)) FROM batch_base
  WHERE doc_id NOT IN (SELECT doc_id FROM strip)
),
it AS (SELECT doc_id, string_split_regex(txt, '\\s+') AS toks FROM ingest),
iw AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(toks) - {_SPAN_W} + 1, 0))) AS s, toks
  FROM it
),
ih AS (
  SELECT DISTINCT doc_id, md5(array_to_string(toks[s+1:s+{_SPAN_W}], ' ')) AS h
  FROM iw
),
novel AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new_hashes FROM ih i
  WHERE NOT EXISTS (SELECT 1 FROM store st WHERE st.h = i.h)
  GROUP BY doc_id
)
SELECT bb.doc_id, bb.n_tokens,
       CAST(coalesce(s2.removed_tokens, 0) AS BIGINT) AS removed_tokens,
       CAST(coalesce(novel.n_new_hashes, 0) AS BIGINT) AS n_new_hashes
FROM batch_base bb
LEFT JOIN strip s2 ON bb.doc_id = s2.doc_id
LEFT JOIN novel ON bb.doc_id = novel.doc_id
ORDER BY bb.doc_id
"""


DAILY_INGEST_CYCLE_ORACLE = _daily_cycle_oracle()


@query("daily_ingest_cycle", oracle=DAILY_INGEST_CYCLE_ORACLE)
def q_daily_ingest_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily pipeline's read+write loop composed end-to-end: strip the
    incoming batch against the persisted span store, then report — per
    batch doc — its size, what the strip removed, and how many distinct
    window hashes the INGESTED text (clean where stripped, original
    otherwise) will append to gen-2. The store is consumed exactly once
    (one eager checkpoint feeds the strip probe AND the novelty
    anti-join); the strip result is checkpointed too (it feeds the clean
    tokens, the affected-id anti-join, and the removed_tokens join — three
    consumers of a small affected-docs frame, the
    incremental_minhash_near_dups materialize-once convention).

    Semantics note (the post-strip choice): appending hashes of the
    CLEANED text means excision joints — token adjacencies the strip
    itself created — do enter the store. That is the honest consequence
    of storing cleaned docs: tomorrow's dedup runs against what the
    corpus actually contains. The alternative (append pre-strip hashes)
    would let a duplicated passage's flanks re-enter verbatim tomorrow
    without being detectable as duplicates of TODAY's ingest."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokenized(docs)
    corpus = toks.filter(F.col("doc_id") % 10 != 0)
    batch = toks.filter(F.col("doc_id") % 10 == 0)
    store = _wds.span_hash_store(corpus).localCheckpoint(eager=True)

    from ..operators.text import TOKEN_SPLIT_RE
    from .web_dedup_stream import incremental_strip_new_docs

    stripped = incremental_strip_new_docs(batch, store).localCheckpoint(eager=True)
    affected = stripped.select("doc_id")
    ingest = (
        stripped.select(
            "doc_id", F.split("clean_text", TOKEN_SPLIT_RE).alias("toks")
        )
        .unionByName(
            batch.join(affected, "doc_id", "left_anti").select("doc_id", "toks")
        )
        .withColumn("n_tokens", F.size("toks").cast("long"))
    )
    from ..operators.dedup import token_window_hashes

    novel = (
        token_window_hashes(ingest, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .join(store, "h", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_hashes"))
    )
    return (
        batch.select("doc_id", "n_tokens")
        .join(stripped.select("doc_id", "removed_tokens"), "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("removed_tokens", F.lit(0)).cast("long").alias("removed_tokens"),
            F.coalesce("n_new_hashes", F.lit(0)).cast("long").alias("n_new_hashes"),
        )
        .orderBy("doc_id")
    )


# --- registry names: ivf_store_append, ivf_refreshed_centroids (reg. r16) ---
# (r16 lookahead) — the EMBEDDING store family's write side: new vectors
# are assigned to their nearest existing inverted list (the IVF
# assignment step a production ANN index runs on every ingest), and the
# coarse quantizer is refreshed from the grown lists (centroid drift —
# the maintenance that keeps probe recall from decaying as the corpus
# shifts). The vec_id % 10 == 0 slice plays the unlabeled ingest batch.

# Oracle text moved to ._span_shared in r16 (one truth for the batch AND
# streaming assignment paths — see _IVF_ASSIGN_ORACLE's leaf comment);
# the public name stays here for tests and external importers.
IVF_STORE_APPEND_ORACLE = _IVF_ASSIGN_ORACLE


def ivf_assign(batch: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each ingest vector to its nearest centroid (cosine; ties
    break to the lower label — interpolated identically in the oracle).
    The centroid table is O(labels) — the ivf_topk broadcast idiom, so
    the 'cross join' is a broadcast nested loop over a handful of rows
    per vector, never a shuffle. Returns (vec_id, assigned_label, sim)."""
    from ..operators.similarity import cosine

    sims = batch.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "label",
        cosine(F.col("embedding"), F.col("centroid")).alias("cos"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "label")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("label").cast("int").alias("assigned_label"),
            F.round("cos", 5).alias("sim"),
        )
    )


@query("ivf_store_append", oracle=IVF_STORE_APPEND_ORACLE)
def q_ivf_store_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ingest assignment: each new vector joins the inverted list of
    its nearest existing centroid. Gate output = the append rows
    (vec_id, assigned_label, sim) — the rows a production index writes
    to its bucketed list table."""
    from ..operators.similarity import ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    return ivf_assign(batch, ivf_centroids(corpus)).orderBy("vec_id")


IVF_REFRESHED_CENTROIDS_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
batch AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 0),
cd AS (
  SELECT label, i - 1 AS dim, avg(v[i]) AS c
  FROM corpus, UNNEST(range(1, len(v) + 1)) AS u(i)
  GROUP BY 1, 2
),
cl AS (SELECT label, list(c ORDER BY dim) AS cv FROM cd GROUP BY label),
sims AS (
  SELECT b.vec_id, b.v, cl.label,
         list_dot_product(b.v, cl.cv)
           / (sqrt(list_dot_product(b.v, b.v))
              * sqrt(list_dot_product(cl.cv, cl.cv))) AS cos
  FROM batch b CROSS JOIN cl
),
pick AS (
  SELECT vec_id, v, label, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, label) AS rn
  FROM sims
),
grown AS (
  SELECT label, v FROM corpus
  UNION ALL
  SELECT label, v FROM pick WHERE rn = 1
)
SELECT CAST(label AS INTEGER) AS label, CAST(i - 1 AS INTEGER) AS dim,
       round(avg(v[i]), 6) AS centroid_val
FROM grown, UNNEST(range(1, len(v) + 1)) AS u(i)
GROUP BY 1, 2 ORDER BY label, dim
"""


@query("ivf_refreshed_centroids", oracle=IVF_REFRESHED_CENTROIDS_ORACLE)
def q_ivf_refreshed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer refresh after the append: per-list centroids recomputed
    over corpus ∪ newly-assigned vectors — the drift maintenance that
    keeps IVF probe recall from decaying as the corpus distribution
    shifts. Flat (label, dim, centroid_val) rows, the label_centroids
    engine-agnostic compare shape; the shuffle carries O(labels × dims)
    partial sums, never vectors."""
    from ..operators.similarity import ivf_centroids, label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    assigned = ivf_assign(batch, ivf_centroids(corpus)).select(
        "vec_id", F.col("assigned_label").alias("label")
    )
    grown = corpus.select("label", "embedding").unionByName(
        batch.join(assigned, "vec_id").select("label", "embedding")
    )
    return (
        label_centroids(grown)
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("dim").cast("int").alias("dim"),
            "centroid_val",
        )
        .orderBy("label", "dim")
    )


# --- tombstones: the DELETE side of the store lifecycle ---------------------
# (r16 lookahead, prepared in the r14 continuation.) Append and compact
# cover growth; a production corpus also SHRINKS — takedown requests,
# robots retro-withdrawals, license revocations. Deleting a document must
# propagate into the dedup stores, else tomorrow's ingest of the same
# content is silently dropped as a "duplicate" of text the corpus no
# longer contains (a correctness bug, not hygiene: the store would
# permanently embargo content nobody holds).
#
# Two-level semantics, mirrored from how real pipelines handle removal:
#   1. CONTENT expansion: a takedown targets content, so every corpus doc
#      byte-identical to a requested doc (same exact fingerprint) is
#      removed with it.
#   2. Key purge with SHARING protection: a store key is purged only when
#      its last holder leaves. Doc-level fingerprints lose all holders by
#      construction (expansion removed them); W-token window hashes may
#      be SHARED with surviving docs (cross-doc duplicated passages) and
#      those must stay — the store reflects what the corpus still
#      contains.
#
# 100 TB design: sharing protection needs holder counts, so the
# delete-capable span store is the REFCOUNT store (h, n_holders) — the
# distinct-hash store physically cannot answer "was this the last
# holder". The decrement side scans ONLY the removed docs' text (small);
# the store side joins on the bucketed key with no text; nothing rescans
# the surviving corpus. (The self-contained gates below rebuild the store
# from the corpus because the sandbox has no persisted generation — the
# production path reads it, exactly like the incremental probe family.)

# _TOMBSTONE_RESIDUE (doc_id % 10 == 3 -> the takedown-request slice)
# moved to ._span_shared in r16, same partial-init rationale as
# _SPAN_WINDOW_CTES above; re-exported via the top-of-file import.


def takedown_holder_ids(corpus: DataFrame, requests: DataFrame) -> DataFrame:
    """Content expansion: ids of every corpus doc whose exact fingerprint
    matches ANY requested doc's (includes the requests themselves). One
    semi join on the fingerprint — bucket-local at scale. The sf testdata
    has no byte-identical cross-doc pairs, so on the gates this is an
    identity map (still executed, still oracle-mirrored); the expansion
    behavior itself is pinned by a planted-duplicate law test."""
    req_fps = requests.select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    ).distinct()
    return (
        corpus.select(
            "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
        )
        .join(req_fps, "fingerprint", "semi")
        .select("doc_id")
    )


def span_refcount_store(toks: DataFrame) -> DataFrame:
    """The delete-capable span store: per window hash, how many distinct
    docs hold it. Same doc-local hash construction as ``span_hash_store``
    (its distinct-hash projection equals that store exactly); the count
    is what makes last-holder purges O(removed docs) instead of a corpus
    rescan. Output: (h, n_holders)."""
    from ..operators.dedup import token_window_hashes

    return (
        token_window_hashes(toks, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_holders"))
    )


def tombstone_decrements(removed_toks: DataFrame) -> DataFrame:
    """Per window hash, how many of the REMOVED docs held it — the
    refcount decrement a takedown writes. Scans only the removed docs'
    text; output is (h, n_dec) narrow rows."""
    from ..operators.dedup import token_window_hashes

    return (
        token_window_hashes(removed_toks, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dec"))
    )


def purged_refcount_store(store: DataFrame, dec: DataFrame) -> DataFrame:
    """Apply decrements: (h, n_holders, n_dec, n_after) for every store
    key. Keys with n_after == 0 are the purge set (last holder left);
    n_dec > 0 and n_after > 0 are the sharing-protected keeps. One left
    join on the bucketed key."""
    return store.join(dec, "h", "left").select(
        "h",
        "n_holders",
        F.coalesce("n_dec", F.lit(0)).cast("long").alias("n_dec"),
        (F.col("n_holders") - F.coalesce("n_dec", F.lit(0)))
        .cast("long")
        .alias("n_after"),
    )


# --- planned registry name: span_store_tombstones ---------------------------

SPAN_STORE_TOMBSTONES_ORACLE = f"""
WITH {_SPAN_WINDOW_CTES},
dh AS (SELECT DISTINCT doc_id, h FROM h WHERE doc_id % 10 <> 0),
req AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fp
  FROM documents WHERE doc_id % 10 = {_TOMBSTONE_RESIDUE}
),
removed AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 10 <> 0
    AND md5(lower(trim(text))) IN (SELECT fp FROM req)
),
store AS (SELECT h, CAST(count(*) AS BIGINT) AS n_holders FROM dh GROUP BY h),
dec AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n_dec FROM dh
  WHERE doc_id IN (SELECT doc_id FROM removed) GROUP BY h
),
af AS (
  SELECT s.h, s.n_holders - coalesce(d.n_dec, 0) AS n_after,
         coalesce(d.n_dec, 0) AS n_dec
  FROM store s LEFT JOIN dec d ON s.h = d.h
)
SELECT ('0x' || substr(h, 1, 8))::BIGINT % {_N_BUCKETS} AS bucket_id,
       CAST(count(*) FILTER (n_after = 0) AS BIGINT) AS n_purged,
       CAST(count(*) FILTER (n_dec > 0 AND n_after > 0) AS BIGINT)
         AS n_shared_kept,
       CAST(count(*) FILTER (n_after > 0) AS BIGINT) AS n_remaining
FROM af GROUP BY bucket_id ORDER BY bucket_id
"""


@query("span_store_tombstones", oracle=SPAN_STORE_TOMBSTONES_ORACLE)
def q_span_store_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown propagation into the span refcount store: expand the
    request slice to all byte-identical holders, decrement their window
    hashes, and report per bucket how many keys lost their last holder
    (purged), how many survived because a surviving doc shares the
    passage (sharing-protected — the case the refcount exists for;
    non-degenerate on this corpus via the planted cross-doc passages),
    and how many keys remain. The purge law — post-purge store ==
    from-scratch refcount store over the surviving docs — is test-pinned
    alongside this gate."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    removed = takedown_holder_ids(
        corpus, corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    )
    ctoks = _tokenized(corpus)
    store = span_refcount_store(ctoks)
    dec = tombstone_decrements(ctoks.join(removed, "doc_id", "semi"))
    after = purged_refcount_store(store, dec)
    bucket = (
        F.conv(F.substring(F.col("h"), 1, 8), 16, 10).cast("long") % _N_BUCKETS
    ).alias("bucket_id")
    return (
        after.select(bucket, "n_dec", "n_after")
        .groupBy("bucket_id")
        .agg(
            F.sum(F.when(F.col("n_after") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_purged"),
            F.sum(
                F.when((F.col("n_dec") > 0) & (F.col("n_after") > 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_shared_kept"),
            F.sum(F.when(F.col("n_after") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_remaining"),
        )
        .orderBy("bucket_id")
    )


# --- planned registry name: fingerprint_store_tombstones --------------------

FINGERPRINT_STORE_TOMBSTONES_ORACLE = f"""
WITH fps AS (
  SELECT doc_id, md5(lower(trim(text))) AS fingerprint
  FROM documents WHERE doc_id % 10 <> 0
),
req AS (
  SELECT DISTINCT fingerprint FROM fps WHERE doc_id % 10 = {_TOMBSTONE_RESIDUE}
),
removed AS (
  SELECT doc_id, fingerprint FROM fps
  WHERE fingerprint IN (SELECT fingerprint FROM req)
),
tagged AS (
  SELECT fingerprint,
         fingerprint IN (SELECT fingerprint FROM req) AS is_purged
  FROM (SELECT DISTINCT fingerprint FROM fps)
),
kb AS (
  SELECT ('0x' || substr(fingerprint, 1, 8))::BIGINT % {_N_BUCKETS}
           AS bucket_id,
         CAST(sum(CASE WHEN is_purged THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purged,
         CAST(sum(CASE WHEN is_purged THEN 0 ELSE 1 END) AS BIGINT)
           AS n_remaining
  FROM tagged GROUP BY bucket_id
),
db AS (
  SELECT ('0x' || substr(fingerprint, 1, 8))::BIGINT % {_N_BUCKETS}
           AS bucket_id,
         CAST(count(*) AS BIGINT) AS n_docs_removed
  FROM removed GROUP BY bucket_id
)
SELECT kb.bucket_id, CAST(coalesce(db.n_docs_removed, 0) AS BIGINT)
         AS n_docs_removed,
       kb.n_purged, kb.n_remaining
FROM kb LEFT JOIN db ON kb.bucket_id = db.bucket_id
ORDER BY kb.bucket_id
"""


@query("fingerprint_store_tombstones", oracle=FINGERPRINT_STORE_TOMBSTONES_ORACLE)
def q_fingerprint_store_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level takedown into the exact-fingerprint store. After content
    expansion every holder of a requested fingerprint is removed, so the
    purge is exact delete-by-key (no refcount needed at this granularity
    — the sharing case lives one level down, in the span gate). Report
    per bucket: docs removed, keys purged, keys remaining. The rebuild
    law — post-purge store == from-scratch store over surviving docs —
    is test-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    fps = corpus.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )
    req_fps = (
        fps.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
        .select("fingerprint")
        .distinct()
    )
    removed = fps.join(req_fps, "fingerprint", "semi")
    store = exact_fingerprint_store(corpus)
    tagged = store.join(
        req_fps.withColumn("is_purged", F.lit(True)), "fingerprint", "left"
    ).select("fingerprint", F.coalesce("is_purged", F.lit(False)).alias("is_purged"))
    bucket = (
        F.conv(F.substring(F.col("fingerprint"), 1, 8), 16, 10).cast("long")
        % _N_BUCKETS
    ).alias("bucket_id")
    kb = tagged.select(bucket, "is_purged").groupBy("bucket_id").agg(
        F.sum(F.when(F.col("is_purged"), 1).otherwise(0)).cast("long").alias("n_purged"),
        F.sum(F.when(~F.col("is_purged"), 1).otherwise(0))
        .cast("long")
        .alias("n_remaining"),
    )
    db = removed.select(bucket).groupBy("bucket_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_removed")
    )
    return (
        kb.join(db, "bucket_id", "left")
        .select(
            "bucket_id",
            F.coalesce("n_docs_removed", F.lit(0)).cast("long").alias("n_docs_removed"),
            "n_purged",
            "n_remaining",
        )
        .orderBy("bucket_id")
    )


def minhash_store_tombstones(
    store_bands: DataFrame, store_arrs: DataFrame, removed_ids: DataFrame
) -> DataFrame:
    """Delete a doc set from BOTH MinHash store tables. Band rows and
    shingle arrays are keyed per doc — no cross-doc state lives in
    either table — so removal is two anti-joins on doc_id (bucket-local
    when the tables are id-bucketed; a shingle shared with a surviving
    doc is untouched because it lives inside each holder's OWN array,
    unlike the span store's shared refcounted hashes). Law-pinned in
    tests/test_store_maintenance.py: probing the deleted-from store is
    indistinguishable from probing a from-scratch store over the
    surviving docs — jaccard values included — which is exactly the
    claim that band rows are per-doc separable. Returns
    (bands_after, arrs_after)."""
    ids = removed_ids.select("doc_id")
    return (
        store_bands.join(ids, "doc_id", "left_anti"),
        store_arrs.join(ids, "doc_id", "left_anti"),
    )


def ivf_store_tombstones(lists: DataFrame, removed_ids: DataFrame) -> tuple:
    """Delete vectors from the IVF inverted lists and refresh the coarse
    quantizer over what remains. List rows are keyed per vector (one
    anti-join on vec_id); the refresh is the same O(labels × dims)
    partial-agg shuffle as the append-side refresh — a label whose list
    emptied disappears from the quantizer entirely (its centroid is
    undefined, and leaving a stale centroid would direct probes at an
    empty list forever). Law-pinned: removed ids never appear in any
    subsequent probe, and emptied labels vanish from the refreshed
    quantizer. Returns (lists_after, refreshed_centroids)."""
    from ..operators.similarity import ivf_centroids

    survivors = lists.join(removed_ids.select("vec_id"), "vec_id", "left_anti")
    return survivors, ivf_centroids(survivors)


def ivf_centroid_state(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """The MERGEABLE representation of the coarse quantizer: per (label,
    dim) the running vector-sum and member count, whose ratio is the
    centroid. This is the delete-capable form of the IVF refresh —
    ``ivf_store_tombstones`` above rebuilds centroids by rescanning the
    surviving lists (O(corpus) per delete); with this state persisted,
    appends and deletes are pure increments/decrements that scan ONLY
    the changed vectors (the span store's refcount lesson applied to
    the quantizer). O(labels × dims) rows regardless of corpus size."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.sum(F.col("v").cast("double")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def centroids_from_state(state: DataFrame) -> DataFrame:
    """Flat (label, dim, centroid_val) from the mergeable state — the
    same 6-dp shape as ``label_centroids``, so the two representations
    are directly law-comparable."""
    return state.select(
        "label", "dim", F.round(F.col("s") / F.col("n"), 6).alias("centroid_val")
    )


def ivf_state_remove(
    state: DataFrame,
    removed: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Decrement the quantizer state by the removed vectors' contributions
    — the incremental delete. Scans ONLY the removed rows (at 100 TB: the
    takedown slice, not the corpus); the join carries O(labels × dims)
    state rows against an O(removed-labels × dims) decrement, both tiny.
    A label whose count reaches zero drops out entirely (same
    emptied-list rule as ivf_store_tombstones: a stale centroid would
    direct probes at an empty list forever).

    CALLER CONTRACT (the takedown family's standard): the removed set is
    applied once — replaying a decrement double-subtracts. Law-pinned in
    tests/test_store_maintenance.py: remove ≡ rebuild over survivors
    (exactly on integer vectors, within one 6-dp rounding step on the
    fixture), and append → remove round-trips to the original state."""
    dec = ivf_centroid_state(removed, label_col, vec_col).select(
        "label", "dim", F.col("s").alias("ds"), F.col("n").alias("dn")
    )
    return (
        state.join(dec, ["label", "dim"], "left")
        .select(
            "label",
            "dim",
            (F.col("s") - F.coalesce("ds", F.lit(0.0))).alias("s"),
            (F.col("n") - F.coalesce("dn", F.lit(0))).cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
    )


def ivf_state_append(
    state: DataFrame,
    added: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Increment the quantizer state by an ingest batch's contributions —
    the O(batch) append twin of ``ivf_state_remove``. Full outer on
    (label, dim) so a batch introducing a brand-new label creates its
    state rows."""
    inc = ivf_centroid_state(added, label_col, vec_col).select(
        "label", "dim", F.col("s").alias("as_"), F.col("n").alias("an")
    )
    return state.join(inc, ["label", "dim"], "full_outer").select(
        "label",
        "dim",
        (F.coalesce("s", F.lit(0.0)) + F.coalesce("as_", F.lit(0.0))).alias("s"),
        (F.coalesce("n", F.lit(0)) + F.coalesce("an", F.lit(0)))
        .cast("long")
        .alias("n"),
    )


def refcount_store_append(store_rc: DataFrame, batch_toks: DataFrame) -> DataFrame:
    """Append an ingest batch to the REFCOUNT span store (the
    delete-capable representation): add the batch's per-hash distinct-doc
    counts to the stored holder counts — a full outer join on the
    bucketed key (novel hashes enter at their batch multiplicity; shared
    hashes gain holders). Unlike the distinct-key append
    (``store_append_delta``), every batch holder counts: the refcount
    must reflect multiplicity, else a later takedown of one holder would
    purge a hash another doc still holds.

    CALLER CONTRACT: the batch must contain only docs NOT already counted
    in the store (run the exact-dedup survivor filter first, the
    ``minhash_store_append`` admission rule) — re-presenting a counted
    doc would inflate its hashes' refcounts and make the matching
    takedown under-purge. Law-pinned: append ≡ from-scratch refcount
    store over corpus ∪ batch, and the full lifecycle
    (append → takedown → append) ≡ from-scratch over the final doc set."""
    from ..operators.dedup import token_window_hashes

    add = (
        token_window_hashes(batch_toks, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_add"))
    )
    return store_rc.join(add, "h", "full_outer").select(
        "h",
        (F.coalesce("n_holders", F.lit(0)) + F.coalesce("n_add", F.lit(0)))
        .cast("long")
        .alias("n_holders"),
    )


# --- library capability (r17, post-saturation policy): IVF list rebalance ---
# The third leg of the embedding-store lifecycle: appends (ivf_store_append)
# concentrate ingest drift into a few inverted lists; deletes
# (ivf_store_tombstones / ivf_state_remove) shrink others. A production
# ANN index periodically SPLITS overloaded lists (the rebalancing every
# large IVF deployment runs — see the public FAISS index-maintenance
# doctrine) so probe latency stays bounded by the target list size
# instead of the hottest list. No registry entry (the registry saturated
# at 242 in the r17 flip — OPERATORS.md "Registry policy after
# saturation"); gated by laws + hypothesis sweep + a planted scale rung.
#
# Reference parity note: the reference (StreamJob.java) has no vector
# store at all — this belongs to the LLM-pipeline extension's
# similarity-search arc.


def overloaded_labels(
    lists: DataFrame, threshold: int, label_col: str = "label"
) -> DataFrame:
    """(label, n) for every inverted list larger than ``threshold`` —
    one keyed count over the lists table, O(labels) output."""
    return (
        lists.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") > threshold)
    )


def _sq_dist(a, b):
    """Squared L2 between two array<double> columns (the kmeans_fit
    distance, inlined so this module doesn't import the clustering
    module's private helper)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_split_overloaded(
    lists: DataFrame,
    threshold: int,
    max_iter: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Split every inverted list larger than ``threshold`` into two via a
    deterministic per-label 2-means, leaving every other list untouched.
    Returns ``(rebalanced_lists, split_map)`` where rebalanced_lists has
    the input's (id, label, vec) shape with split members relabeled, and
    split_map is (parent_label, child_label, sub, n_members) — sub 0
    keeps the parent label, sub 1 gets a fresh label above the current
    maximum (dense-ranked over the split parents, so concurrent splits
    can't collide).

    Semantics / determinism: seeds are the member with the lowest id
    (sub 0) and the member farthest from it (squared L2, ties to the
    lower id; sub 1), followed by exactly ``max_iter`` Lloyd rounds run
    for ALL overloaded labels simultaneously — assignment ties break to
    the lower sub, so the procedure is a pure function of the member
    set. A degenerate list (all members identical: sub 1 ends empty
    because every tie goes to sub 0) is NOT split — splitting cannot
    reduce it, and emitting an empty child would leave a stale centroid
    directing probes at an empty list (the ivf_store_tombstones rule).

    LAWS (test-pinned in tests/test_store_maintenance.py): the output is
    a PARTITION of the input ids (same id multiset, each exactly once);
    non-overloaded lists pass through bit-identical; every emitted split
    has two nonempty children whose member union is exactly the parent's
    members; a threshold above the largest list is the identity; and the
    mergeable quantizer state commutes with the rebalance —
    ivf_centroid_state(rebalanced) == state - parent members + relabeled
    members (exact on integer vectors).

    100 TB design: the overloaded-label frame is O(labels) and drives a
    broadcast semi join, so ONLY the overloaded lists' vectors are ever
    scanned (measured flat in the opt-in rung while the untouched corpus
    doubles); each Lloyd round is one broadcast join against the
    O(2·labels) centroid frame plus one (label, sub, dim) partial agg —
    the kmeans_fit iteration contract, never a shuffle on vector id; the
    members frame is checkpointed once so rounds re-read the
    materialized columnar form; the only driver-side values are loop
    indices — centroids stay DataFrames end to end (no collect at any
    size, stricter than kmeans_fit's bounded k×d take)."""
    over = overloaded_labels(lists, threshold, label_col)
    members = (
        lists.join(
            F.broadcast(over.select(F.col("label").alias(label_col))),
            label_col,
            "semi",
        )
        .select(
            F.col(label_col).alias("label"),
            F.col(id_col).alias("id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
            F.col(vec_col).alias("orig"),
        )
        .localCheckpoint(eager=True)
    )

    from pyspark.sql.window import Window

    w_min = Window.partitionBy("label").orderBy("id")
    s0 = (
        members.withColumn("rn", F.row_number().over(w_min))
        .filter(F.col("rn") == 1)
        .select("label", F.col("v").alias("c"))
    )
    d0 = members.join(F.broadcast(s0), "label").select(
        "label", "id", "v", _sq_dist(F.col("v"), F.col("c")).alias("d2")
    )
    w_far = Window.partitionBy("label").orderBy(F.desc("d2"), "id")
    s1 = (
        d0.withColumn("rn", F.row_number().over(w_far))
        .filter(F.col("rn") == 1)
        .select("label", F.col("v").alias("c"))
    )
    cents = (
        s0.select("label", F.lit(0).alias("sub"), "c")
        .unionByName(s1.select("label", F.lit(1).alias("sub"), "c"))
        .localCheckpoint(eager=True)
    )

    w_pick = Window.partitionBy("label", "id").orderBy("d2", "sub")
    assigned = None
    for _ in range(max_iter):
        assigned = (
            members.join(F.broadcast(cents), "label")
            .select("label", "id", "v", "sub", _sq_dist(F.col("v"), F.col("c")).alias("d2"))
            .withColumn("rn", F.row_number().over(w_pick))
            .filter(F.col("rn") == 1)
            .select("label", "id", "v", "sub")
        )
        per_dim = (
            assigned.select("label", "sub", F.posexplode("v").alias("dim", "val"))
            .groupBy("label", "sub", "dim")
            .agg(F.avg("val").alias("m"))
        )
        cents = (
            per_dim.groupBy("label", "sub")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .localCheckpoint(eager=True)
        )

    # narrow (label, id, sub) rows, O(moved members) — checkpointed so the
    # three consumers below (child counts, relabel, split map) re-read the
    # materialized form instead of each replaying the Lloyd chain
    final = (
        members.join(F.broadcast(cents), "label")
        .select("label", "id", "sub", _sq_dist(F.col("v"), F.col("c")).alias("d2"))
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("label", "id", "sub")
        .localCheckpoint(eager=True)
    )

    # a split must yield TWO nonempty children; degenerate lists stay whole
    child_counts = final.groupBy("label", "sub").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    splittable = (
        child_counts.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_subs"))
        .filter(F.col("n_subs") == 2)
        .select("label")
    )

    # fresh labels above the global max — the single-row broadcast-scalar
    # idiom (source_reputation), never a driver collect
    mx = lists.agg(F.max(F.col(label_col)).cast("long").alias("mx"))
    # the unpartitioned window and the scalar crossJoin both act on the
    # O(split labels) frame — single-partition by design, kilobytes.
    # Checkpointed so the two output plans consume the materialized map
    # (no nested-loop node survives into them) instead of re-deriving it.
    w_rank = Window.orderBy("label")
    child_map = (
        splittable.withColumn("rank", F.dense_rank().over(w_rank))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("label").alias("parent_label"),
            (F.col("mx") + F.col("rank")).cast("long").alias("label1"),
        )
        .localCheckpoint(eager=True)
    )
    split_map = (
        child_counts.join(
            F.broadcast(child_map),
            F.col("label") == F.col("parent_label"),
        )
        .select(
            "parent_label",
            F.when(F.col("sub") == 0, F.col("parent_label"))
            .otherwise(F.col("label1"))
            .cast("long")
            .alias("child_label"),
            F.col("sub").cast("int").alias("sub"),
            "n_members",
        )
    )

    relabeled = (
        final.join(F.broadcast(child_map), F.col("label") == F.col("parent_label"), "inner")
        .join(members.select("label", "id", "orig"), ["label", "id"])
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("sub") == 0, F.col("label"))
            .otherwise(F.col("label1"))
            .cast(lists.schema[label_col].dataType.simpleString())
            .alias(label_col),
            F.col("orig").alias(vec_col),
        )
    )
    untouched = (
        lists.select(id_col, label_col, vec_col)
        .join(
            F.broadcast(child_map.select(F.col("parent_label").alias(label_col))),
            label_col,
            "left_anti",
        )
        .select(id_col, label_col, vec_col)  # the USING join fronts the key
    )
    return untouched.unionByName(relabeled), split_map


# --- library capability (r17, post-saturation policy): bloom-screened append


def bloom_screened_append_delta(
    store: DataFrame,
    batch_keys: DataFrame,
    key: str,
    m: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """``store_append_delta`` with the mergeable Bloom state
    (operators/bloom.py) as an admission pre-filter — the composition
    the daily cycle runs at 100 TB: the batch probes the O(m/64)
    broadcast bitmap first, keys the filter has NEVER seen are admitted
    to the delta immediately (the no-false-negative law makes that
    EXACT — a bloom-negative key cannot be in the store), and only the
    bloom-POSITIVE suspects (true duplicates plus the filter's small
    false-positive mass) pay the anti-join against the key store. The
    store-side join input shrinks from |batch| to
    |true dups| + FPR·|novel| rows, and in the common
    mostly-novel-ingest case the big store table is probed by a
    near-empty frame.

    EXACTNESS LAW (test-pinned): output == store_append_delta(store,
    batch) as key sets, for any m/k — the bloom can only err toward
    sending a novel key through the exact confirm, never toward
    dropping one. The screening-mass law is also pinned: the suspect
    set is exactly the true-duplicate keys plus the planted-negative
    false positives.

    In production the bitmap is the PERSISTED bloom state maintained by
    bloom_merge over daily shards (lossless, never re-scanned); here it
    is built from the store for a self-contained gate — the plan shapes
    are identical either way."""
    from ..operators.bloom import _BLOOM_K, _BLOOM_M, bloom_bits, bloom_probe

    m = _BLOOM_M if m is None else m
    k = _BLOOM_K if k is None else k
    state = bloom_bits(store.select(F.col(key).alias("key")), m=m, k=k)
    verdicts = bloom_probe(
        batch_keys.select(key).distinct().withColumnRenamed(key, "key"),
        state,
        m=m,
        k=k,
    )
    fast_novel = verdicts.filter(~F.col("bloom_positive")).select(
        F.col("key").alias(key)
    )
    suspects = verdicts.filter(F.col("bloom_positive")).select(
        F.col("key").alias(key)
    )
    confirmed_novel = suspects.join(store.select(key), key, "left_anti")
    return fast_novel.unionByName(confirmed_novel)
