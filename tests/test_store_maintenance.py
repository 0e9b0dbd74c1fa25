"""Gates and laws for the r15-queued store-maintenance family (the write
side of the incremental dedup stores). The two q_* functions are
oracle-gated HERE through the same assert_matches_oracle harness the
driver mirrors — registration (queries.py import + ledger row) is
deferred to r15 per the r14 zero-add-slot arithmetic (OPERATORS.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.dedup import (
    exact_fingerprint_store,
    incremental_exact_dedup,
)
from flink_stream_processing_spark.queries_impl.store_maintenance import (
    FINGERPRINT_STORE_COMPACTION_ORACLE,
    SPAN_STORE_COMPACTION_ORACLE,
    _N_BUCKETS,
    _TOMBSTONE_RESIDUE,
    _tokenized,
    compacted_store,
    compaction_report,
    q_fingerprint_store_compaction,
    q_span_store_compaction,
    store_append_delta,
)
from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
    incremental_strip_new_docs,
    span_hash_store,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


# --- driver-equivalent oracle gates (the r15 registration contract) --------


def test_fingerprint_store_compaction_matches_oracle(spark):
    assert_matches_oracle(
        q_fingerprint_store_compaction(spark, SF_DIR),
        FINGERPRINT_STORE_COMPACTION_ORACLE,
        SF_DIR,
    )


def test_span_store_compaction_matches_oracle(spark):
    assert_matches_oracle(
        q_span_store_compaction(spark, SF_DIR),
        SPAN_STORE_COMPACTION_ORACLE,
        SF_DIR,
    )


# --- maintenance laws -------------------------------------------------------


def _three_way_split(docs):
    """corpus / yesterday's batch (b1) / today's batch (b2)."""
    corpus = docs.filter(~(F.col("doc_id") % 10).isin(0, 5))
    b1 = docs.filter(F.col("doc_id") % 10 == 5)
    b2 = docs.filter(F.col("doc_id") % 10 == 0)
    return corpus, b1, b2


def test_exact_probe_equivalence_after_append(spark):
    """THE maintenance invariant: probing the maintained store (gen-1 +
    b1's delta) is indistinguishable from probing a from-scratch store
    over corpus ∪ b1. If append lost or duplicated a key, tomorrow's
    dedup (b2) would diverge."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, b2 = _three_way_split(docs)
    store = exact_fingerprint_store(corpus)
    delta = store_append_delta(store, exact_fingerprint_store(b1), "fingerprint")
    maintained = compacted_store(store, delta, "fingerprint").select("fingerprint")
    scratch = exact_fingerprint_store(corpus.unionByName(b1))
    got = sorted(incremental_exact_dedup(b2, maintained).collect())
    want = sorted(incremental_exact_dedup(b2, scratch).collect())
    assert got == want and len(want) > 0


def test_span_probe_equivalence_after_append(spark):
    """Same invariant one level down: stripping b2 against the maintained
    span store == stripping against a from-scratch store over corpus ∪ b1."""
    toks = _tokenized(load_table(spark, SF_DIR, "documents"))
    corpus, b1, b2 = _three_way_split(toks)
    store = span_hash_store(corpus)
    delta = store_append_delta(store, span_hash_store(b1), "h")
    maintained = (
        compacted_store(store, delta, "h").select("h").localCheckpoint(eager=True)
    )
    scratch = span_hash_store(corpus.unionByName(b1)).localCheckpoint(eager=True)
    got = sorted(incremental_strip_new_docs(b2, maintained).collect())
    want = sorted(incremental_strip_new_docs(b2, scratch).collect())
    assert got == want and len(want) > 0


def test_append_is_idempotent(spark):
    """Re-presenting an already-appended batch yields an EMPTY delta —
    the daily append can be retried (a failed-run replay) without
    growing the store."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    store = exact_fingerprint_store(corpus)
    b1_keys = exact_fingerprint_store(b1)
    delta = store_append_delta(store, b1_keys, "fingerprint")
    gen2 = compacted_store(store, delta, "fingerprint").select("fingerprint")
    assert store_append_delta(gen2, b1_keys, "fingerprint").count() == 0


def test_compacted_store_is_distinct_and_buckets_partition(spark):
    """gen-2 is distinct BY CONSTRUCTION (no extra distinct shuffle — the
    operator's documented contract), every bucket_id lands in [0, B),
    and the report's totals reassemble the store exactly."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    store = exact_fingerprint_store(corpus)
    delta = store_append_delta(store, exact_fingerprint_store(b1), "fingerprint")
    gen2 = compacted_store(store, delta, "fingerprint").cache()
    try:
        n = gen2.count()
        assert gen2.select("fingerprint").distinct().count() == n
        bounds = gen2.agg(
            F.min("bucket_id").alias("lo"), F.max("bucket_id").alias("hi")
        ).first()
        assert 0 <= bounds["lo"] and bounds["hi"] < _N_BUCKETS
        report = compaction_report(gen2)
        totals = report.agg(
            F.sum("n_carried").alias("c"),
            F.sum("n_new").alias("d"),
            F.sum("n_total").alias("t"),
        ).first()
        assert totals["t"] == n == totals["c"] + totals["d"]
        assert totals["c"] == store.count() and totals["d"] == delta.count()
    finally:
        gen2.unpersist(blocking=True)


def test_delta_never_rescans_corpus_text(spark):
    """The maintenance plan's 100 TB contract: once gen-1 is persisted,
    computing the NEXT delta reads only the batch — the corpus text
    appears nowhere in the plan (same pin as
    test_incremental_strip_never_rescans_corpus)."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    persisted = exact_fingerprint_store(corpus).localCheckpoint(eager=True)
    delta = store_append_delta(persisted, exact_fingerprint_store(b1), "fingerprint")
    plan = delta._jdf.queryExecution().optimizedPlan().toString()
    # exactly one parquet relation (the batch); the store side is the
    # checkpointed RDD
    assert plan.count("Relation") <= 1
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


# --- MinHash band-store append (r16 lookahead) -------------------------------


def test_minhash_store_append_matches_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        MINHASH_STORE_APPEND_ORACLE,
        q_minhash_store_append,
    )

    assert_matches_oracle(
        q_minhash_store_append(spark, SF_DIR), MINHASH_STORE_APPEND_ORACLE, SF_DIR
    )


def test_minhash_band_store_probe_equivalence(spark):
    """The band-store maintenance law: probing the MAINTAINED store (corpus
    bands + the append's survivor bands) with tomorrow's batch is
    indistinguishable from probing a from-scratch store over corpus ∪
    survivors — pinning the xxhash64 band payload the SQL gate cannot
    reach (both paths must produce identical (doc_a, doc_b, jaccard)
    matches, jaccard included, through the full candidate-join + verify
    pipeline)."""
    from flink_stream_processing_spark.operators.dedup import (
        band_hashes,
        minhash_signatures,
        shingle_array,
    )
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        minhash_store_append,
    )
    from flink_stream_processing_spark.operators.dedup import (
        incremental_minhash_near_dups,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, b2 = _three_way_split(docs)
    fp_store = exact_fingerprint_store(corpus)

    def distinct_arrs(frame):
        return shingle_array(frame).select(
            "doc_id", F.array_distinct("sh_arr").alias("sh_arr")
        )

    corpus_arrs = distinct_arrs(corpus).localCheckpoint(eager=True)
    corpus_bands = band_hashes(minhash_signatures(corpus_arrs))
    new_bands, new_arrs = minhash_store_append(b1, fp_store)
    maintained_bands = corpus_bands.unionByName(new_bands)
    maintained_arrs = corpus_arrs.unionByName(new_arrs)

    from flink_stream_processing_spark.operators.dedup import incremental_exact_dedup

    survivors = incremental_exact_dedup(b1, fp_store).select("doc_id")
    extended = corpus.unionByName(b1.join(survivors, "doc_id", "semi"))
    scratch_arrs = distinct_arrs(extended).localCheckpoint(eager=True)
    scratch_bands = band_hashes(minhash_signatures(scratch_arrs))

    got = sorted(
        incremental_minhash_near_dups(
            b2, maintained_bands, maintained_arrs, threshold=0.3
        ).collect()
    )
    want = sorted(
        incremental_minhash_near_dups(
            b2, scratch_bands, scratch_arrs, threshold=0.3
        ).collect()
    )
    assert got == want
    assert len(want) > 0  # the law must bite: some b2 doc matches the store


# --- daily ingest cycle (r16 lookahead) --------------------------------------


def test_daily_ingest_cycle_matches_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        DAILY_INGEST_CYCLE_ORACLE,
        q_daily_ingest_cycle,
    )

    assert_matches_oracle(
        q_daily_ingest_cycle(spark, SF_DIR), DAILY_INGEST_CYCLE_ORACLE, SF_DIR
    )


def test_daily_cycle_unaffected_docs_contribute_all_their_windows(spark):
    """Internal consistency law: a batch doc the strip did NOT touch has,
    by definition, zero windows in the store — so its n_new_hashes must
    equal its full distinct-window count, and its removed_tokens must be
    0. (An affected doc's contribution is smaller: its matched windows
    are excised and its joints re-hash.)"""
    from flink_stream_processing_spark.operators.dedup import token_window_hashes
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _tokenized,
        q_daily_ingest_cycle,
    )
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        _SPAN_W,
    )

    out = {r["doc_id"]: r for r in q_daily_ingest_cycle(spark, SF_DIR).collect()}
    batch = _tokenized(
        load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 10 == 0)
    )
    wins = {
        r["doc_id"]: r["n"]
        for r in token_window_hashes(batch, _SPAN_W)
        .select("doc_id", "h")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    unaffected = [d for d, r in out.items() if r["removed_tokens"] == 0]
    affected = [d for d, r in out.items() if r["removed_tokens"] > 0]
    assert unaffected and affected  # the fixture exercises both branches
    for d in unaffected:
        assert out[d]["n_new_hashes"] == wins.get(d, 0), d


# --- IVF embedding-store maintenance (r16 lookahead) --------------------------


def test_ivf_store_append_matches_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        IVF_STORE_APPEND_ORACLE,
        q_ivf_store_append,
    )

    assert_matches_oracle(
        q_ivf_store_append(spark, SF_DIR), IVF_STORE_APPEND_ORACLE, SF_DIR
    )


def test_ivf_refreshed_centroids_match_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        IVF_REFRESHED_CENTROIDS_ORACLE,
        q_ivf_refreshed_centroids,
    )

    assert_matches_oracle(
        q_ivf_refreshed_centroids(spark, SF_DIR),
        IVF_REFRESHED_CENTROIDS_ORACLE,
        SF_DIR,
    )


def test_ivf_append_covers_batch_exactly_once(spark):
    """Every ingest vector is assigned to exactly one list, sims are valid
    cosines, and every assigned label exists in the corpus quantizer."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        q_ivf_store_append,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    batch_ids = {
        r["vec_id"] for r in emb.filter(F.col("vec_id") % 10 == 0).collect()
    }
    corpus_labels = {
        r["label"]
        for r in emb.filter(F.col("vec_id") % 10 != 0).select("label").distinct().collect()
    }
    rows = q_ivf_store_append(spark, SF_DIR).collect()
    assert {r["vec_id"] for r in rows} == batch_ids
    assert len(rows) == len(batch_ids)
    for r in rows:
        assert r["assigned_label"] in corpus_labels
        assert -1.0 <= r["sim"] <= 1.0

# --- tombstones: the delete side (r16 lookahead) ------------------------------


def test_span_store_tombstones_match_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        SPAN_STORE_TOMBSTONES_ORACLE,
        q_span_store_tombstones,
    )

    assert_matches_oracle(
        q_span_store_tombstones(spark, SF_DIR), SPAN_STORE_TOMBSTONES_ORACLE, SF_DIR
    )


def test_fingerprint_store_tombstones_match_oracle(spark):
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        FINGERPRINT_STORE_TOMBSTONES_ORACLE,
        q_fingerprint_store_tombstones,
    )

    assert_matches_oracle(
        q_fingerprint_store_tombstones(spark, SF_DIR),
        FINGERPRINT_STORE_TOMBSTONES_ORACLE,
        SF_DIR,
    )


def test_span_tombstone_purge_equals_rebuild(spark):
    """THE delete invariant: applying decrements to the refcount store and
    dropping zero-holder keys is indistinguishable from rebuilding the
    store over the surviving docs — (h, n_holders) pairs included. If a
    shared hash were purged (or a last-holder hash kept), the two sides
    would diverge. Also pins non-degeneracy: the fixture must exercise
    purges AND sharing-protected keeps."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _TOMBSTONE_RESIDUE,
        _tokenized,
        purged_refcount_store,
        span_refcount_store,
        takedown_holder_ids,
        tombstone_decrements,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    removed = takedown_holder_ids(
        corpus, corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    ).localCheckpoint(eager=True)
    ctoks = _tokenized(corpus)
    after = purged_refcount_store(
        span_refcount_store(ctoks),
        tombstone_decrements(ctoks.join(removed, "doc_id", "semi")),
    ).localCheckpoint(eager=True)
    got = sorted(
        (r["h"], r["n_after"])
        for r in after.filter(F.col("n_after") > 0).collect()
    )
    want = sorted(
        (r["h"], r["n_holders"])
        for r in span_refcount_store(
            ctoks.join(removed, "doc_id", "left_anti")
        ).collect()
    )
    assert got == want and len(want) > 0
    stats = after.agg(
        F.sum(F.when(F.col("n_after") == 0, 1).otherwise(0)).alias("purged"),
        F.sum(
            F.when((F.col("n_dec") > 0) & (F.col("n_after") > 0), 1).otherwise(0)
        ).alias("shared_kept"),
    ).first()
    assert stats["purged"] > 0 and stats["shared_kept"] > 0
    # refcounts can never go negative: removed docs are a subset of holders
    assert after.filter(F.col("n_after") < 0).count() == 0


def test_fingerprint_tombstone_purge_equals_rebuild(spark):
    """Doc-level twin of the rebuild law: store minus the requested keys ==
    from-scratch store over the surviving docs (content expansion removes
    every holder, so delete-by-key is exact at this granularity)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _TOMBSTONE_RESIDUE,
        takedown_holder_ids,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    removed = takedown_holder_ids(
        corpus, corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    )
    store = exact_fingerprint_store(corpus)
    req_fps = exact_fingerprint_store(
        corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    )
    got = sorted(
        r["fingerprint"]
        for r in store.join(req_fps, "fingerprint", "left_anti").collect()
    )
    want = sorted(
        r["fingerprint"]
        for r in exact_fingerprint_store(
            corpus.join(removed, "doc_id", "left_anti")
        ).collect()
    )
    assert got == want and len(want) > 0


def test_takedown_expansion_catches_duplicate_holders(spark):
    """Planted-duplicate law (the sf corpus has no byte-identical pairs, so
    the gates exercise expansion only as an identity map): a takedown of
    one doc removes EVERY doc with the same exact fingerprint — case- and
    edge-whitespace-insensitively (the exact_fingerprint_store contract)
    — and nothing else."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        takedown_holder_ids,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "  Alpha beta GAMMA  "),  # same fingerprint as 1
            (3, "alpha beta gamma delta"),  # superstring: different fp
            (4, "unrelated text"),
        ],
        "doc_id long, text string",
    )
    requests = corpus.filter(F.col("doc_id") == 1)
    got = sorted(r["doc_id"] for r in takedown_holder_ids(corpus, requests).collect())
    assert got == [1, 2]


def test_tombstone_requests_are_idempotent(spark):
    """Replaying the same takedown against the already-purged store is a
    no-op: the removed docs are gone, so the decrement side is empty and
    the store is unchanged — the delete can be retried like the append."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _TOMBSTONE_RESIDUE,
        _tokenized,
        purged_refcount_store,
        span_refcount_store,
        takedown_holder_ids,
        tombstone_decrements,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    removed = takedown_holder_ids(
        corpus, corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    ).localCheckpoint(eager=True)
    surviving_toks = _tokenized(corpus.join(removed, "doc_id", "left_anti"))
    purged_store = span_refcount_store(surviving_toks).localCheckpoint(eager=True)
    replay_dec = tombstone_decrements(
        _tokenized(corpus.join(removed, "doc_id", "left_anti")).join(
            removed, "doc_id", "semi"
        )
    )
    assert replay_dec.count() == 0
    after = purged_refcount_store(purged_store, replay_dec)
    assert after.filter(F.col("n_after") != F.col("n_holders")).count() == 0


def test_minhash_store_tombstone_probe_equivalence(spark):
    """Delete law for the MinHash family: after removing a doc set from
    both store tables, probing with tomorrow's batch is indistinguishable
    from probing a from-scratch store over the surviving docs — jaccard
    values included. Pins that band rows are per-doc separable (no
    cross-doc state hides in the store), which is what makes delete an
    anti-join instead of a rebuild."""
    from flink_stream_processing_spark.operators.dedup import (
        band_hashes,
        incremental_minhash_near_dups,
        minhash_signatures,
        shingle_array,
    )
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        minhash_store_tombstones,
    )

    docs = load_table(spark, SF_DIR, "documents")
    full = docs.filter(F.col("doc_id") % 10 != 0)
    probe = docs.filter(F.col("doc_id") % 10 == 0)

    def distinct_arrs(frame):
        return shingle_array(frame).select(
            "doc_id", F.array_distinct("sh_arr").alias("sh_arr")
        )

    full_arrs = distinct_arrs(full).localCheckpoint(eager=True)
    full_bands = band_hashes(minhash_signatures(full_arrs)).localCheckpoint(
        eager=True
    )
    before = sorted(
        incremental_minhash_near_dups(
            probe, full_bands, full_arrs, threshold=0.3
        ).collect()
    )
    assert len(before) > 0
    # take down exactly the store docs the probe currently matches — the
    # delete is guaranteed to bite, and the post-delete match set is
    # exactly predictable (removal can only remove candidates)
    removed_ids = sorted({r["doc_a"] for r in before})
    removed = full.filter(F.col("doc_id").isin(removed_ids)).select("doc_id")
    bands_after, arrs_after = minhash_store_tombstones(
        full_bands, full_arrs, removed
    )

    surviving = full.filter(~F.col("doc_id").isin(removed_ids))
    scratch_arrs = distinct_arrs(surviving).localCheckpoint(eager=True)
    scratch_bands = band_hashes(minhash_signatures(scratch_arrs))

    got = sorted(
        incremental_minhash_near_dups(
            probe, bands_after, arrs_after, threshold=0.3
        ).collect()
    )
    want = sorted(
        incremental_minhash_near_dups(
            probe, scratch_bands, scratch_arrs, threshold=0.3
        ).collect()
    )
    assert got == want
    # every surviving match was already there, none involves a removed doc
    assert set(got) <= set(before)
    assert not {r["doc_a"] for r in got} & set(removed_ids)


def test_ivf_store_tombstones_reroute_probes(spark):
    """Delete law for the IVF family: removed vectors never appear in a
    probe again, a label whose inverted list emptied vanishes from the
    refreshed quantizer (a stale centroid would direct probes at an
    empty list forever), and surviving coverage is exactly-once."""
    from flink_stream_processing_spark.operators.similarity import ivf_topk
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_store_tombstones,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    labels = [r["label"] for r in emb.select("label").distinct().collect()]
    kill_label = sorted(labels)[0]
    # remove one entire inverted list plus a residue slice of the rest
    removed = emb.filter(
        (F.col("label") == kill_label) | (F.col("vec_id") % 7 == 0)
    ).select("vec_id")
    removed_ids = {r["vec_id"] for r in removed.collect()}
    lists_after, centroids_after = ivf_store_tombstones(emb, removed)
    lists_after = lists_after.localCheckpoint(eager=True)

    refreshed_labels = {r["label"] for r in centroids_after.select("label").collect()}
    assert kill_label not in refreshed_labels
    assert refreshed_labels == {
        r["label"] for r in lists_after.select("label").distinct().collect()
    }

    qvec = emb.filter(F.col("label") == kill_label).select("embedding").first()[0]
    hits = ivf_topk(lists_after, [float(x) for x in qvec], k=10, n_probe=3).collect()
    assert len(hits) == 10
    assert not ({r["vec_id"] for r in hits} & removed_ids)
    # exactly-once coverage of the survivors
    n_before = emb.count()
    assert lists_after.count() == n_before - len(removed_ids)
    assert lists_after.select("vec_id").distinct().count() == lists_after.count()


def test_refcount_append_equals_rebuild(spark):
    """Append law on the refcount representation: adding a batch's
    per-hash holder counts to the stored counts equals rebuilding the
    refcount store over corpus ∪ batch — (h, n_holders) pairs included
    (the distinct-key law can't see a multiplicity bug; this one can)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _tokenized,
        refcount_store_append,
        span_refcount_store,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    got = sorted(
        (r["h"], r["n_holders"])
        for r in refcount_store_append(
            span_refcount_store(_tokenized(corpus)), _tokenized(b1)
        ).collect()
    )
    want = sorted(
        (r["h"], r["n_holders"])
        for r in span_refcount_store(_tokenized(corpus.unionByName(b1))).collect()
    )
    assert got == want and len(want) > 0


def test_refcount_store_full_lifecycle(spark):
    """THE lifecycle integration law: a store maintained through
    append(b1) → takedown(removed) → append(b2) is indistinguishable
    from a from-scratch refcount store over the final doc set
    ((corpus ∪ b1) − removed ∪ b2). Every verb composes on the same
    representation; a multiplicity error in any one of them diverges
    here."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        _TOMBSTONE_RESIDUE,
        _tokenized,
        purged_refcount_store,
        refcount_store_append,
        span_refcount_store,
        takedown_holder_ids,
        tombstone_decrements,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, b2 = _three_way_split(docs)
    day0 = span_refcount_store(_tokenized(corpus))
    day1 = refcount_store_append(day0, _tokenized(b1)).localCheckpoint(eager=True)

    held = corpus.unionByName(b1)
    removed = takedown_holder_ids(
        held, held.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    ).localCheckpoint(eager=True)
    dec = tombstone_decrements(_tokenized(held.join(removed, "doc_id", "semi")))
    day2 = (
        purged_refcount_store(day1, dec)
        .filter(F.col("n_after") > 0)
        .select("h", F.col("n_after").alias("n_holders"))
    )
    day3 = refcount_store_append(day2, _tokenized(b2))

    final_docs = held.join(removed, "doc_id", "left_anti").unionByName(b2)
    want = sorted(
        (r["h"], r["n_holders"])
        for r in span_refcount_store(_tokenized(final_docs)).collect()
    )
    got = sorted((r["h"], r["n_holders"]) for r in day3.collect())
    assert got == want and len(want) > 0


# --- mergeable quantizer state: the O(changed) IVF maintenance form ---------


def _int_vec_frame(spark):
    """Small integer-valued embedding frame: sums are exact doubles, so
    the incremental-state laws can be asserted EXACTLY (identical sums →
    identical divisions → identical 6-dp roundings), no fp tolerance."""
    rows = [
        (0, 0, [2.0, 4.0, 6.0]),
        (1, 0, [4.0, 8.0, 2.0]),
        (2, 0, [6.0, 0.0, 4.0]),
        (3, 1, [1.0, 3.0, 5.0]),
        (4, 1, [7.0, 5.0, 3.0]),
        (5, 2, [9.0, 9.0, 9.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_ivf_state_remove_equals_rebuild_exact(spark):
    """remove ≡ rebuild, exactly: decrementing the mergeable state by the
    removed vectors yields the same (label, dim, centroid_val) rows as
    rebuilding from the survivors — including the emptied-label drop
    (label 2's only member is removed; a stale centroid would direct
    probes at an empty list forever)."""
    from flink_stream_processing_spark.operators.similarity import label_centroids
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        centroids_from_state,
        ivf_centroid_state,
        ivf_state_remove,
    )

    emb = _int_vec_frame(spark)
    removed = emb.filter(F.col("vec_id").isin(1, 5))
    survivors = emb.filter(~F.col("vec_id").isin(1, 5))
    got = sorted(
        (r["label"], r["dim"], r["centroid_val"])
        for r in centroids_from_state(
            ivf_state_remove(ivf_centroid_state(emb), removed)
        ).collect()
    )
    want = sorted(
        (r["label"], r["dim"], r["centroid_val"])
        for r in label_centroids(survivors).collect()
    )
    assert got == want
    assert not any(lab == 2 for lab, _, _ in got), "emptied label must drop"


def test_ivf_state_append_remove_round_trip(spark):
    """append → remove of the same batch restores the original state:
    counts exactly, sums bit-for-bat on these integer vectors — the
    replay-idempotence shape every store family pins (a batch introducing
    a brand-new label vanishes again with it)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_centroid_state,
        ivf_state_append,
        ivf_state_remove,
    )

    emb = _int_vec_frame(spark)
    batch = spark.createDataFrame(
        [(100, 1, [2.0, 2.0, 2.0]), (101, 7, [5.0, 1.0, 5.0])],
        "vec_id long, label int, embedding array<double>",
    )
    state0 = ivf_centroid_state(emb)
    state2 = ivf_state_remove(ivf_state_append(state0, batch), batch)
    got = sorted((r["label"], r["dim"], r["s"], r["n"]) for r in state2.collect())
    want = sorted((r["label"], r["dim"], r["s"], r["n"]) for r in state0.collect())
    assert got == want
    assert not any(lab == 7 for lab, _, _, _ in got)


def test_ivf_state_remove_matches_rebuild_on_fixture(spark):
    """The same law on the real fixture (float sums): incremental delete
    of the tombstone slice agrees with the from-scratch rebuild within
    one 6-dp rounding step per value — the fp-subtraction error bound,
    NOT a semantic gap."""
    from flink_stream_processing_spark.operators.similarity import label_centroids
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        centroids_from_state,
        ivf_centroid_state,
        ivf_state_remove,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    removed = emb.filter(F.col("vec_id") % 10 == _TOMBSTONE_RESIDUE)
    survivors = emb.filter(F.col("vec_id") % 10 != _TOMBSTONE_RESIDUE)
    inc = centroids_from_state(
        ivf_state_remove(ivf_centroid_state(emb), removed)
    ).withColumnRenamed("centroid_val", "v_inc")
    rebuilt = label_centroids(survivors)
    joined = inc.join(rebuilt, ["label", "dim"], "full_outer")
    n_rows = joined.count()
    assert n_rows == rebuilt.count() == inc.count(), "label/dim sets must agree"
    drifted = joined.filter(
        F.abs(F.col("v_inc") - F.col("centroid_val")) > 2e-6
    ).count()
    assert drifted == 0


# --- IVF list rebalance (r17 library capability: ivf_split_overloaded) ------


def _split_fixture(spark):
    """Label 0 overloaded (40 members in two planted blobs at +/-100 on
    dim 0 — even ids plus, odd ids minus), labels 1-2 small. Integer-ish
    vectors so every state law is exact."""
    rows = []
    for i in range(40):
        rows.append((i, 0, [100.0 if i % 2 == 0 else -100.0, float(i % 5), 0.0]))
    for i in range(40, 50):
        rows.append((i, 1, [0.0, 50.0, float(i)]))
    for i in range(50, 58):
        rows.append((i, 2, [0.0, -50.0, float(i)]))
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def test_ivf_split_partitions_ids_and_recovers_planted_blobs(spark):
    """The split is a PARTITION of the input ids (every id exactly once),
    non-overloaded lists pass through bit-identical, and on two
    well-separated planted blobs the 2-means recovers the blobs exactly
    — sub 0 keeps the parent label, sub 1 gets a fresh label above the
    global max."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_split_overloaded,
    )

    lists = _split_fixture(spark)
    reb, smap = ivf_split_overloaded(lists, threshold=20)
    out = reb.orderBy("vec_id").collect()
    assert [r.vec_id for r in out] == list(range(58))  # partition, exactly once

    m = {(r.parent_label, r.sub): (r.child_label, r.n_members) for r in smap.collect()}
    assert m == {(0, 0): (0, 20), (0, 1): (3, 20)}  # fresh label = max(2)+1

    lab_even = {r.label for r in out if r.vec_id < 40 and r.vec_id % 2 == 0}
    lab_odd = {r.label for r in out if r.vec_id < 40 and r.vec_id % 2 == 1}
    assert lab_even == {0} and lab_odd == {3}  # exact planted recovery

    untouched_in = lists.filter(F.col("label") != 0).orderBy("vec_id").collect()
    untouched_out = [r for r in out if r.vec_id >= 40]
    assert untouched_in == untouched_out  # bit-identical pass-through


def test_ivf_split_identity_when_nothing_overloaded(spark):
    """A threshold above the largest list is the identity: empty split
    map, byte-identical lists (schema and column order included)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_split_overloaded,
    )

    lists = _split_fixture(spark)
    reb, smap = ivf_split_overloaded(lists, threshold=1000)
    assert smap.count() == 0
    assert reb.schema == lists.schema
    assert reb.orderBy("vec_id").collect() == lists.orderBy("vec_id").collect()


def test_ivf_split_degenerate_identical_list_not_split(spark):
    """All members identical: 2-means cannot separate them (every
    assignment ties to sub 0), so the list must stay WHOLE — an empty
    child would leave a stale centroid directing probes at an empty
    list (the ivf_store_tombstones rule)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_split_overloaded,
    )

    ident = spark.createDataFrame(
        [(i, 7, [1.0, 2.0]) for i in range(30)],
        "vec_id long, label long, embedding array<double>",
    )
    reb, smap = ivf_split_overloaded(ident, threshold=10)
    assert smap.count() == 0
    assert reb.count() == 30
    assert reb.filter(F.col("label") != 7).count() == 0


def test_ivf_split_commutes_with_mergeable_state(spark):
    """The quantizer-state law: state(rebalanced) == append(remove(
    state(lists), moved members at their OLD labels), moved members at
    their NEW labels) — exact on integer vectors. This is what makes the
    split an O(changed) store operation: the persisted state is
    maintained from the moved members alone, never a corpus rescan."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_centroid_state,
        ivf_split_overloaded,
        ivf_state_append,
        ivf_state_remove,
    )

    lists = _split_fixture(spark)
    reb, smap = ivf_split_overloaded(lists, threshold=20)
    split_parents = smap.select(F.col("parent_label").alias("label")).distinct()
    moved_old = lists.join(split_parents, "label", "semi")
    child_labels = smap.select(F.col("child_label").alias("label")).distinct()
    moved_new = reb.join(moved_old.select("vec_id"), "vec_id", "semi").join(
        child_labels, "label", "semi"
    )
    s_direct = ivf_centroid_state(reb.select("label", "embedding"))
    s_incr = ivf_state_append(
        ivf_state_remove(
            ivf_centroid_state(lists.select("label", "embedding")),
            moved_old.select("label", "embedding"),
        ),
        moved_new.select("label", "embedding"),
    )
    joined = (
        s_direct.withColumnRenamed("s", "s1")
        .withColumnRenamed("n", "n1")
        .join(s_incr, ["label", "dim"], "full_outer")
    )
    bad = joined.filter(
        (F.col("s1") != F.col("s")) | (F.col("n1") != F.col("n"))
    ).count()
    assert bad == 0
    assert joined.filter(F.col("s1").isNull() | F.col("s").isNull()).count() == 0


def test_ivf_split_children_union_is_parent(spark):
    """Every emitted split has two nonempty children whose member union
    is exactly the parent's member set."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_split_overloaded,
    )

    lists = _split_fixture(spark)
    reb, smap = ivf_split_overloaded(lists, threshold=20)
    for parent in [r.parent_label for r in smap.select("parent_label").distinct().collect()]:
        kids = {r.child_label: r.n_members for r in smap.filter(F.col("parent_label") == parent).collect()}
        assert len(kids) == 2 and all(n > 0 for n in kids.values())
        parent_ids = {r.vec_id for r in lists.filter(F.col("label") == parent).collect()}
        child_ids = {
            r.vec_id for r in reb.join(
                smap.filter(F.col("parent_label") == parent)
                .select(F.col("child_label").alias("label")),
                "label",
                "semi",
            ).collect()
        }
        assert child_ids == parent_ids


# --- bloom-screened append (r17 library capability) --------------------------


def test_bloom_screened_delta_equals_exact_delta(spark):
    """Composition exactness on the real fixture: the bloom-screened
    append admits EXACTLY store_append_delta's key set — the
    no-false-negative law makes the fast-admit path safe, and the exact
    confirm catches every false positive. Pinned for a small m too
    (high FPR regime: many suspects, same answer)."""
    from flink_stream_processing_spark.operators.dedup import (
        exact_fingerprint_store,
    )
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        bloom_screened_append_delta,
        store_append_delta,
    )
    from flink_stream_processing_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    store = exact_fingerprint_store(docs.filter(F.col("doc_id") % 10 != 0))
    batch = exact_fingerprint_store(docs.filter(F.col("doc_id") % 10 == 0))
    want = sorted(
        r["fingerprint"] for r in store_append_delta(store, batch, "fingerprint").collect()
    )
    assert want  # non-degenerate: the fixture batch has novel keys
    for m in (1 << 16, 1 << 8):  # healthy filter AND saturated tiny filter
        got = sorted(
            r["fingerprint"]
            for r in bloom_screened_append_delta(store, batch, "fingerprint", m=m).collect()
        )
        assert got == want, f"m={m}"


def test_bloom_screen_shrinks_the_exact_probe_side(spark):
    """The screening-mass law: the suspect set that reaches the exact
    store is the true duplicates plus the filter's false positives —
    measured here as: on an all-novel synthetic batch with a healthy m,
    the exact confirm receives well under 5% of the batch (vs 100%
    unscreened)."""
    from flink_stream_processing_spark.operators.bloom import bloom_bits, bloom_probe

    store_keys = spark.range(20_000).select(
        F.md5(F.concat(F.lit("s"), F.col("id").cast("string"))).alias("fingerprint")
    )
    novel = spark.range(10_000).select(
        F.md5(F.concat(F.lit("n"), F.col("id").cast("string"))).alias("fingerprint")
    )
    state = bloom_bits(store_keys.withColumnRenamed("fingerprint", "key"), m=1 << 20)
    suspects = (
        bloom_probe(novel.withColumnRenamed("fingerprint", "key"), state, m=1 << 20)
        .filter(F.col("bloom_positive"))
        .count()
    )
    assert suspects < 0.05 * 10_000, suspects


def test_bloom_store_multi_generation_cycle(spark):
    """The persisted-filter daily cycle (r18-queue item, pinned early):
    day N's admission filter = bloom_merge(day N-1's filter,
    bloom_bits(day N's admitted delta)). Three planted generations with
    overlapping batches must satisfy BOTH invariants exactly — (a) every
    day's screened delta equals the exact store_append_delta against the
    keys admitted so far (the composition stays exact across
    generations), and (b) the generation-3 filter is bit-identical to a
    single-pass build over all admitted keys (the lossless-merge chain
    never drifts from the from-scratch filter, so the cycle can run
    forever without a re-scan)."""
    from flink_stream_processing_spark.operators.bloom import bloom_bits, bloom_merge
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        store_append_delta,
    )

    def keys(prefix, lo, hi):
        return spark.range(lo, hi).select(
            F.md5(F.concat(F.lit(prefix), F.col("id").cast("string"))).alias("k")
        )

    # day batches overlap each other AND re-present old keys
    batches = [
        keys("a", 0, 3_000),
        keys("a", 2_000, 5_000).unionByName(keys("b", 0, 1_000)),
        keys("a", 4_000, 6_000).unionByName(keys("b", 500, 1_500)),
    ]
    store = spark.createDataFrame([], "k string")
    filt = bloom_bits(store.withColumnRenamed("k", "key"))
    for day, batch in enumerate(batches):
        # screened admission against the PERSISTED filter: negatives are
        # admitted fast, suspects confirm against the exact store
        from flink_stream_processing_spark.operators.bloom import bloom_probe

        verd = bloom_probe(batch.distinct().withColumnRenamed("k", "key"), filt)
        fast = verd.filter(~F.col("bloom_positive")).select(F.col("key").alias("k"))
        suspects = verd.filter(F.col("bloom_positive")).select(F.col("key").alias("k"))
        delta = fast.unionByName(suspects.join(store, "k", "left_anti"))
        want = sorted(r["k"] for r in store_append_delta(store, batch, "k").collect())
        got = sorted(r["k"] for r in delta.collect())
        assert got == want, f"day {day}: screened delta != exact delta"
        assert want  # every planted day admits something
        store = store.unionByName(delta).localCheckpoint(eager=True)
        filt = bloom_merge(
            filt, bloom_bits(delta.withColumnRenamed("k", "key"))
        ).localCheckpoint(eager=True)
    # the chained filter equals the from-scratch filter over all admitted keys
    scratch = {
        (r["word_idx"], r["word"])
        for r in bloom_bits(store.withColumnRenamed("k", "key")).collect()
    }
    chained = {(r["word_idx"], r["word"]) for r in filt.collect()}
    assert chained == scratch
    assert store.count() == 6_000 + 1_500  # a-keys 0..6000, b-keys 0..1500
