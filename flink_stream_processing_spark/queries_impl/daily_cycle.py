"""The first-class DAILY-CYCLE composition — the one function a 100 TB
corpus operator actually schedules (r18 library capability, post-
saturation policy: no registry entry; laws + hypothesis sweep + plan
pin + planted scale rung — OPERATORS.md "Registry policy after
saturation").

Every maintenance verb in this chain already exists and is individually
law-pinned (store_maintenance.py, operators/bloom.py); what was missing
is the COMPOSITION a production pipeline runs once per ingest day, over
all four persisted store families at once:

    bloom screen  →  exact-store anti-join confirm  →  minhash append
                  →  span refcount update           →  tombstone purge

``DailyStores`` is the persisted state (what lives as bucketed
parquet/Delta tables between runs); ``daily_cycle_step`` is one day.

END-TO-END CYCLE LAW (test-pinned in tests/test_daily_cycle.py, swept
by hypothesis against an exact Python model): N days of incremental
steps produce stores EQUAL — rows, refcounts, band payloads included —
to ``daily_stores_build`` run from scratch over the surviving admitted
doc set. The admission rule is ``incremental_exact_dedup``'s (min-id
representative per novel fingerprint), reproduced here behind the bloom
screen; the bloom's no-false-negative law makes the screened admission
EXACTLY equal to the unscreened anti-join, so the cycle law holds for
any (m, k).

100 TB DESIGN (the point of the composition):
- The ingest batch's TEXT is scanned exactly ONCE per day — an eager
  localCheckpoint at entry feeds the fingerprint extraction, the
  shingle pass, and the span-window pass (plan-pinned: with parquet
  inputs, the five output store plans contain zero batch re-scans). A
  daily batch is the small side (~0.1 % of corpus); materializing it to
  executor storage is cheap and saves three full re-reads.
- The CORPUS is never scanned at all. Every store-side input is the
  persisted state: the bloom bitmap is an O(m/64) broadcast, the exact
  confirm is one anti-join on the bucketed fingerprint key probed only
  by the bloom-POSITIVE suspects (true dups + FPR·novel — in the
  common mostly-novel ingest the big store table is probed by a
  near-empty frame), the refcount update is one keyed outer join, and
  the minhash append writes per-doc rows with no store read.
- The takedown side scans ONLY the removed docs' text (the caller
  fetches it by id — an O(removed) bucketed lookup, see
  ``takedown_holder_ids`` for the expansion that produces the ids).

BLOOM-AFTER-PURGE SEMANTICS (deliberate, documented): a Bloom filter
cannot delete, so purged fingerprints stay bloom-positive. That NEVER
breaks exactness — a purged key's re-ingest is bloom-positive, falls
to the exact confirm, finds the store no longer has it, and is
correctly admitted; the only cost is suspect mass that no longer
corresponds to a stored key. ``rebuild_bloom=True`` re-derives the
bitmap from the post-purge fingerprint STORE (one scan of the key
table, never the corpus) — the periodic compaction-time hygiene a
production deployment runs; law-pinned bit-identical to a from-scratch
bitmap.

CALLER CONTRACT (inherited from the tombstone family, law-pinned
there): ``removed_docs`` must be EXPANSION-CLOSED — every current
holder of a removed fingerprint is in the set (``takedown_holder_ids``
produces exactly this) — and each takedown is applied once (replaying
a day double-decrements; see test_tombstone_requests_are_idempotent
for the request-level idempotence that holds BEFORE expansion).

Reference parity note: the reference pipeline (StreamJob.java) keeps no
persisted dedup state at all — this module belongs to the LLM-pipeline
extension's incremental-dedup arc (SURVEY.md "training-data pipeline"
mandate), modeled on the daily-ingest maintenance loop described in
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) §4.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import (
    _BLOOM_K,
    _BLOOM_M,
    bloom_bits,
    bloom_merge,
    bloom_probe,
)
from ..operators.cbf import cbf_counts, cbf_merge, cbf_probe, cbf_remove
from ..operators.dedup import (
    band_hashes,
    exact_fingerprint_store,
    minhash_signatures,
    shingle_array,
)
# Module-object binding, not attribute imports: store_maintenance is a
# REGISTERED module (queries.py imports it), so an attribute import here
# would break under first-import cycles (the _span_shared rule); resolve
# its functions at call time.
from . import store_maintenance as _sm


# --- admission-screen strategies (r19): the cycle is screen-agnostic --------
# "bloom": the r18 default — O(m/64) packed bitmap, lossless merge, NO
#   delete (purged keys stay screen-positive until rebuild_bloom).
# "cbf": counting Bloom filter (operators/cbf.py) — same positions, same
#   no-false-negative guarantee, and takedowns DECREMENT the screen, so
#   the persisted screen stays EXACTLY equal to a from-scratch build
#   over the surviving fingerprint store (law-pinned: the cycle law
#   holds WITHOUT skip_bloom, and a purged doc's re-ingest rides the
#   fast path again instead of paying the exact confirm forever).
# Each strategy: (build(keys_df, key_col, m, k), merge(a, b),
# probe(probes, state, m, k) -> (key, bloom_positive), remove-or-None).


def _screen_strategy(screen: str):
    if screen == "bloom":
        return (
            lambda keys, key_col, m, k: bloom_bits(keys, key_col=key_col, m=m, k=k),
            bloom_merge,
            lambda probes, state, m, k: bloom_probe(probes, state, m=m, k=k),
            None,
        )
    if screen == "cbf":
        return (
            lambda keys, key_col, m, k: cbf_counts(keys, key_col=key_col, m=m, k=k),
            cbf_merge,
            lambda probes, state, m, k: cbf_probe(probes, state, m=m, k=k)
            .withColumnRenamed("cbf_positive", "bloom_positive"),
            lambda state, removed, m, k: cbf_remove(
                state, removed, key_col="fingerprint", m=m, k=k
            ),
        )
    raise ValueError(f"unknown screen {screen!r} (expected 'bloom' or 'cbf')")


class DailyStores(NamedTuple):
    """The four persisted store families the daily cycle maintains — at
    100 TB each is a bucketed parquet/Delta table keyed as noted."""

    fingerprints: DataFrame  # (fingerprint) — exact store, bucketed on key
    bloom: DataFrame  # (word_idx, word) — sparse admission bitmap, O(m/64)
    bands: DataFrame  # (doc_id, band_id, band_hash) — LSH bucket table
    shingles: DataFrame  # (doc_id, sh_arr) — per-doc distinct shingles
    span_rc: DataFrame  # (h, n_holders) — refcount span store, bucketed on h


def _fp(text_col: str = "text"):
    """The family's fingerprint key (exact_fingerprint_store's contract:
    md5 of lower(trim(text)), internal whitespace preserved)."""
    return F.md5(F.lower(F.trim(F.col(text_col))))


def _doc_slice(docs: DataFrame) -> DataFrame:
    """(doc_id, text) projection — everything the cycle reads of a doc."""
    return docs.select("doc_id", "text")


def _minhash_rows(docs: DataFrame):
    """Band + shingle-array rows for a doc frame — ONE shingle pass feeds
    both tables (minhash_store_append's payload, factored so the cycle
    can run it on the already-admitted set without re-deriving
    survivors). Docs under the 3-token shingle floor drop out here, in
    the incremental AND from-scratch paths alike."""
    arrs = shingle_array(docs).select(
        "doc_id", F.array_distinct("sh_arr").alias("sh_arr")
    )
    return band_hashes(minhash_signatures(arrs)), arrs


def daily_stores_build(
    corpus: DataFrame,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    screen: str = "bloom",
) -> DailyStores:
    """From-scratch build over a doc frame — the day-0 bootstrap AND the
    cycle law's comparator (N incremental days must equal this over the
    surviving admitted doc set). One logical pass over the corpus text
    fans into the four extractions; at 100 TB this is the one full-scan
    job the pipeline ever runs.

    Admission semantics are the CYCLE's, unconditionally (r18 ADVICE): a
    corpus containing byte-identical duplicates contributes ONE min-id
    representative per fingerprint to the doc-keyed tables
    (bands/shingles/span_rc), exactly as the incremental path would have
    admitted it — so build and cycle can never produce store states the
    other cannot reach, and the cycle-law comparator holds for ANY
    bootstrap corpus, pre-deduped or not. On an already-deduped corpus
    the representative rule is the identity (one doc per fingerprint)."""
    docs = _doc_slice(corpus)
    rep_ids = (
        docs.select("doc_id", _fp().alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    rep_docs = docs.join(rep_ids, "doc_id", "semi")
    fingerprints = exact_fingerprint_store(docs)
    bands, shingles = _minhash_rows(rep_docs)
    build, _, _, _ = _screen_strategy(screen)
    return DailyStores(
        fingerprints=fingerprints,
        bloom=build(fingerprints, "fingerprint", m, k),
        bands=bands,
        shingles=shingles,
        span_rc=_sm.span_refcount_store(_sm._tokenized(rep_docs)),
    )


def daily_cycle_step(
    stores: DailyStores,
    batch: DataFrame,
    removed_docs: Optional[DataFrame] = None,
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
    rebuild_bloom: bool = False,
    with_report: bool = False,
    screen: str = "bloom",
):
    """One ingest day over all four store families: screen, confirm,
    admit, append, purge. Returns the next generation of every store;
    writes nothing (the caller persists each table, bucket-routed, via
    ``compacted_store`` — exactly as the per-family verbs document).

    ``batch``: today's raw docs (doc_id, text, ...). Scanned once — see
    the module docstring's plan contract. Doc ids must be unique across
    the corpus LIFETIME (the standard contract of every doc-keyed store
    here: bands/shingles key rows on doc_id and takedowns anti-join on
    it, so a recycled id would alias an unrelated document's rows).
    ``removed_docs``: today's EXPANSION-CLOSED takedown set with text
    (doc_id, text, ...), or None for a no-takedown day. Scanned once;
    never triggers a corpus scan. The expansion MUST run over STORE
    MEMBERSHIP — the admitted survivor set — not the raw corpus (r18
    ADVICE): the raw corpus includes non-admitted byte-identical
    duplicates whose spans were never appended, so including them
    over-decrements shared span refcounts (n_after can reach 0 or go
    negative while a live doc still holds the key). The violation is
    OBSERVABLE, not silent: the ``with_report`` path counts
    ``n_span_keys_overdecremented`` (n_after < 0 — impossible under a
    membership-closed expansion, law-pinned at zero in the cycle
    tests), so a pipeline that wires the expansion to the wrong frame
    sees a non-zero audit column on day one.
    ``rebuild_bloom``: re-derive the bitmap from the post-step
    fingerprint store (compaction-time hygiene) instead of the O(delta)
    incremental merge.
    ``screen``: the admission-screen strategy — "bloom" (default, the
    r18 bitmap: no delete, ``rebuild_bloom`` for hygiene) or "cbf"
    (counting Bloom filter: takedowns decrement the screen, the
    persisted screen stays exactly the from-scratch state over
    survivors, and purged keys regain the fast path on re-ingest).
    The stores' ``bloom`` field holds whichever state the strategy
    maintains; a generation must be stepped with the screen it was
    built with.
    ``with_report``: also return the day's single-row audit report
    (``compaction_report``'s analog for the composed cycle) — returns
    ``(DailyStores, report)`` instead of bare ``DailyStores``. Report
    columns, all longs, all over the day's DELTA frames only (no store
    scan): n_batch_docs, n_batch_fps (distinct), n_bloom_fast (screened
    past the store without touching it), n_suspects (paid the exact
    confirm), n_bloom_false_positives (suspects that confirmed novel —
    the screen's wasted confirms), n_admitted (novel fingerprints =
    admitted representative docs), n_removed_docs, n_span_keys_purged
    (last holder left), n_span_keys_protected (decremented but shared —
    the sharing-protection observable), n_span_keys_overdecremented
    (n_after < 0 — the membership-contract violation observable, zero
    under a correct expansion). Law-pinned: the counts satisfy the
    screen partition arithmetic and match exact planted batches.
    """
    batch = _doc_slice(batch).localCheckpoint(eager=True)
    scr_build, scr_merge, scr_probe, scr_remove = _screen_strategy(screen)

    # 1) bloom screen + exact confirm (bloom_screened_append_delta's
    # shape, against the PERSISTED bitmap instead of a rebuilt one).
    batch_fp = batch.select("doc_id", _fp().alias("fingerprint"))
    verdicts = scr_probe(
        batch_fp.select("fingerprint").distinct().withColumnRenamed(
            "fingerprint", "key"
        ),
        stores.bloom,
        m,
        k,
    )
    fast_novel = verdicts.filter(~F.col("bloom_positive")).select(
        F.col("key").alias("fingerprint")
    )
    suspects = verdicts.filter(F.col("bloom_positive")).select(
        F.col("key").alias("fingerprint")
    )
    confirmed_novel = suspects.join(
        stores.fingerprints.select("fingerprint"), "fingerprint", "left_anti"
    )
    # Three consumers (store union, bloom increment, admission semi) of
    # an O(batch) frame — materialize once.
    novel_fps = (
        fast_novel.unionByName(confirmed_novel).localCheckpoint(eager=True)
    )

    # 2) admission: min-id representative per novel fingerprint — the
    # incremental_exact_dedup rule, byte-for-byte (the cycle law depends
    # on it). Two consumers of the admitted text (shingles, spans).
    admitted_ids = (
        batch_fp.join(novel_fps, "fingerprint", "semi")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    admitted_docs = batch.join(
        admitted_ids, "doc_id", "semi"
    ).localCheckpoint(eager=True)

    # 3) appends on all four families.
    fingerprints = stores.fingerprints.unionByName(novel_fps)
    new_bands, new_arrs = _minhash_rows(admitted_docs)
    bands = stores.bands.unionByName(new_bands)
    shingles = stores.shingles.unionByName(new_arrs)
    span_rc = _sm.refcount_store_append(
        stores.span_rc, _sm._tokenized(admitted_docs)
    )
    bloom = scr_merge(stores.bloom, scr_build(novel_fps, "fingerprint", m, k))

    # 4) tombstone purge — expansion-closed, so fingerprint-level removal
    # is clean (every holder leaves), doc-keyed tables anti-join, and the
    # shared-hash refcounts decrement with sharing protection.
    removed = None
    purged = None
    if removed_docs is not None:
        removed = _doc_slice(removed_docs).localCheckpoint(eager=True)
        removed_fps = removed.select(_fp().alias("fingerprint")).distinct()
        removed_ids = removed.select("doc_id")
        fingerprints = fingerprints.join(removed_fps, "fingerprint", "left_anti")
        if scr_remove is not None:
            # delete-capable screen: the takedown decrements the same
            # positions the keys' admission incremented — exact inverse,
            # so the screen tracks the fingerprint store bit-for-bit
            bloom = scr_remove(bloom, removed_fps, m, k)
        bands, shingles = _sm.minhash_store_tombstones(bands, shingles, removed_ids)
        dec = _sm.tombstone_decrements(_sm._tokenized(removed))
        purged = _sm.purged_refcount_store(span_rc, dec)
        if with_report:
            # two consumers below (store filter + report aggregates) of a
            # frame that otherwise re-derives the decrement scan
            purged = purged.localCheckpoint(eager=True)
        span_rc = purged.filter(F.col("n_after") > 0).select(
            "h", F.col("n_after").alias("n_holders")
        )

    if rebuild_bloom:
        bloom = scr_build(fingerprints, "fingerprint", m, k)

    out = DailyStores(
        fingerprints=fingerprints,
        bloom=bloom,
        bands=bands,
        shingles=shingles,
        span_rc=span_rc,
    )
    if not with_report:
        return out

    # the audit row: every aggregate runs over a day-delta frame already
    # materialized above (verdicts derives from the batch checkpoint) —
    # single-row broadcasts composed with the package's scalar-crossJoin
    # convention, never a store scan
    cnt = lambda df, name: F.broadcast(  # noqa: E731
        df.agg(F.count(F.lit(1)).cast("long").alias(name))
    )
    # global aggregates over an EMPTY frame return one row with null
    # sums — coalesce so an empty batch/store reports zeros, not nulls
    screen = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_batch_fps"),
        F.coalesce(
            F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_suspects"),
    )
    report = (
        screen.crossJoin(cnt(batch, "n_batch_docs"))
        .crossJoin(cnt(novel_fps, "n_admitted"))
        .crossJoin(
            cnt(removed, "n_removed_docs")
            if removed is not None
            else F.broadcast(
                screen.select(F.lit(0).cast("long").alias("n_removed_docs"))
            )
        )
        .crossJoin(
            F.broadcast(
                purged.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("n_after") == 0, 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_span_keys_purged"),
                    F.coalesce(
                        F.sum(
                            F.when(
                                (F.col("n_dec") > 0) & (F.col("n_after") > 0), 1
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_span_keys_protected"),
                    # n_after < 0 is impossible under a membership-closed
                    # takedown expansion (every decrement has a matching
                    # append) — a non-zero here means the expansion ran
                    # over the raw corpus instead of the admitted
                    # survivor set and shared keys are being over-purged
                    F.coalesce(
                        F.sum(F.when(F.col("n_after") < 0, 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_span_keys_overdecremented"),
                )
            )
            if purged is not None
            else F.broadcast(
                screen.select(
                    F.lit(0).cast("long").alias("n_span_keys_purged"),
                    F.lit(0).cast("long").alias("n_span_keys_protected"),
                    F.lit(0).cast("long").alias("n_span_keys_overdecremented"),
                )
            )
        )
        .select(
            "n_batch_docs",
            "n_batch_fps",
            (F.col("n_batch_fps") - F.col("n_suspects")).alias("n_bloom_fast"),
            "n_suspects",
            (F.col("n_admitted") - (F.col("n_batch_fps") - F.col("n_suspects")))
            .alias("n_bloom_false_positives"),
            "n_admitted",
            "n_removed_docs",
            "n_span_keys_purged",
            "n_span_keys_protected",
            "n_span_keys_overdecremented",
        )
    )
    return out, report


# --- the embedding-side daily cycle (same round, same policy) ---------------
# The text stores above cover dedup/span maintenance; a 100 TB pipeline
# runs the SAME per-day loop on its vector index: assign the ingest
# batch to the coarse quantizer, append to the inverted lists, keep the
# mergeable centroid state in sync, apply takedowns. The per-verb pieces
# (ivf_assign / ivf_state_append / ivf_state_remove, store_maintenance)
# are law-pinned; this composition pins the CROSS-STORE invariant they
# must jointly preserve:
#
#     state == ivf_centroid_state(lists)     (exact on integer vectors)
#
# through any sequence of appends and takedowns — the O(changed) state
# is always the quantizer a from-scratch rescan of the lists would
# build, so probes never see drift between the two representations.
#
# ORDER SENSITIVITY (deliberate, documented): assignment uses the
# quantizer AS OF the batch's day, so splitting one batch into N days
# can assign a vector differently than the one-shot batch would — the
# same drift a production IVF index accepts (FAISS-style maintenance).
# What IS split-invariant, and law-pinned, is the consistency invariant
# above: however the days were sliced, state ≡ rebuild(lists) holds at
# every generation (the streaming-transparency form this family admits).


class EmbeddingStores(NamedTuple):
    """The vector index's persisted pair — at 100 TB the lists are a
    label-bucketed parquet/Delta table; the state is O(labels × dims)."""

    lists: DataFrame  # (vec_id, label, embedding)
    state: DataFrame  # (label, dim, s, n) — mergeable quantizer state


def centroid_vectors_from_state(state: DataFrame) -> DataFrame:
    """(label, centroid array<double>) from the mergeable state — the
    broadcastable quantizer ivf_assign consumes. s/n per dim, assembled
    in dim order; on integer vectors this EQUALS ivf_centroids over the
    lists (law-pinned), so assigning against the O(labels) state is
    indistinguishable from assigning against a full list rescan."""
    return (
        state.select("label", "dim", (F.col("s") / F.col("n")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda st: st["c"],
            ).alias("centroid")
        )
    )


def embedding_stores_build(labeled: DataFrame) -> EmbeddingStores:
    """From-scratch build over an already-labeled vector frame (the
    trained day-0 index) — bootstrap and law comparator."""
    rows = labeled.select("vec_id", "label", "embedding")
    return EmbeddingStores(lists=rows, state=_sm.ivf_centroid_state(rows))


def embedding_cycle_step(
    stores: EmbeddingStores,
    batch: DataFrame,
    removed_ids: Optional[DataFrame] = None,
) -> EmbeddingStores:
    """One ingest day on the vector index: assign the batch against the
    state-derived quantizer (O(labels) broadcast — the corpus is never
    rescanned), append to lists and state, then apply the takedown
    (ids only — the removed vectors' rows are fetched from the lists by
    one O(removed) semi join, the takedown family's standard shape).
    CALLER CONTRACT (inherited from ivf_state_remove): each takedown is
    applied once; removed_ids ⊆ current list membership; vec_ids are
    unique across the index lifetime (the lists key rows on vec_id)."""
    batch = batch.select("vec_id", "embedding").localCheckpoint(eager=True)
    assigned = _sm.ivf_assign(batch, centroid_vectors_from_state(stores.state))
    new_rows = (
        batch.join(
            assigned.select(
                "vec_id",
                F.col("assigned_label")
                .cast(stores.lists.schema["label"].dataType.simpleString())
                .alias("label"),
            ),
            "vec_id",
        )
        .select("vec_id", "label", "embedding")
        .localCheckpoint(eager=True)
    )
    lists = stores.lists.unionByName(new_rows)
    state = _sm.ivf_state_append(stores.state, new_rows)
    if removed_ids is not None:
        ids = removed_ids.select("vec_id")
        removed_rows = lists.join(ids, "vec_id", "semi").localCheckpoint(
            eager=True
        )
        lists = lists.join(ids, "vec_id", "left_anti")
        state = _sm.ivf_state_remove(state, removed_rows)
    return EmbeddingStores(lists=lists, state=state)
