"""Laws for the r18 daily-cycle composition (queries_impl/daily_cycle.py)
— the library capability wiring bloom screen → exact confirm → minhash
append → span refcount update → tombstone purge into ONE per-day state
transition over all four persisted store families.

The per-verb laws live with their operators (test_store_maintenance.py,
test_bloom.py); this module pins what only the COMPOSITION can get
wrong: cross-family doc-set consistency (every family must agree on
which docs entered and left), the bloom-after-purge exactness argument,
the single-batch-scan plan contract, and the end-to-end N-day ≡
from-scratch cycle law — deterministic on the fixture here, swept on
random shapes against an exact Python model below."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_stream_processing_spark.operators.dedup import incremental_exact_dedup
from flink_stream_processing_spark.queries_impl.daily_cycle import (
    DailyStores,
    daily_cycle_step,
    daily_stores_build,
)
from flink_stream_processing_spark.queries_impl.store_maintenance import (
    _TOMBSTONE_RESIDUE,
)
from flink_stream_processing_spark.sources.batch import load_table

from .conftest import SF_DIR

# The bloom stays deliberately small in the laws: a high fill ratio
# maximizes false positives, which is the HARD path for the exactness
# law (every suspect must be saved by the exact confirm).
_SMALL_M, _SMALL_K = 1 << 10, 3


def _checkpointed(stores: DailyStores) -> DailyStores:
    """Persist a generation the way the production caller would — the
    step's inputs are materialized tables, not live lineage."""
    return DailyStores(*[df.localCheckpoint(eager=True) for df in stores])


def _assert_stores_equal(got: DailyStores, want: DailyStores, skip_bloom: bool):
    """Row-set equality per family (payloads included). The incremental
    bloom is skipped where purges occurred (no-delete is the documented
    design); rebuild_bloom variants compare it bit-for-bit."""
    for fname in got._fields:
        if skip_bloom and fname == "bloom":
            continue
        g, w = getattr(got, fname), getattr(want, fname)
        extra, missing = g.exceptAll(w).count(), w.exceptAll(g).count()
        assert extra == 0 and missing == 0, (
            f"{fname}: {extra} extra / {missing} missing rows vs from-scratch"
        )


def _three_way_split(docs):
    corpus = docs.filter(~(F.col("doc_id") % 10).isin(0, 5))
    b1 = docs.filter(F.col("doc_id") % 10 == 5)
    b2 = docs.filter(F.col("doc_id") % 10 == 0)
    return corpus, b1, b2


def test_daily_cycle_two_generations_equal_from_scratch(spark):
    """THE cycle law on the fixture: day0 build → day1 append → day2
    append+takedown equals a from-scratch build over the surviving doc
    set, across ALL FOUR families (fingerprint sets, band payloads,
    shingle arrays, span refcounts). rebuild_bloom additionally makes
    the bitmap bit-identical to the from-scratch bitmap."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, b2 = _three_way_split(docs)

    day0 = _checkpointed(daily_stores_build(corpus))
    day1 = _checkpointed(daily_cycle_step(day0, b1))

    held = corpus.unionByName(b1)
    removed = held.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    day2 = daily_cycle_step(day1, b2, removed_docs=removed, rebuild_bloom=True)

    # fixture has no byte-identical cross-doc pairs (pinned by the
    # tombstone family), so survivors = held − removed ∪ b2 and the
    # takedown set is expansion-closed by construction
    final_docs = held.join(removed.select("doc_id"), "doc_id", "left_anti").unionByName(b2)
    want = daily_stores_build(final_docs)
    _assert_stores_equal(day2, want, skip_bloom=False)


def test_screened_admission_equals_unscreened_exact_dedup(spark):
    """The composed step's admitted set must equal incremental_exact_dedup
    byte-for-byte — the bloom screen is a pure plan optimization (the
    no-false-negative law), never a semantics change. Run at a high fill
    ratio so false positives actually exercise the confirm path."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    day0 = _checkpointed(daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K))
    day1 = daily_cycle_step(day0, b1, m=_SMALL_M, k=_SMALL_K)
    got = {
        r["fingerprint"]
        for r in day1.fingerprints.exceptAll(day0.fingerprints).collect()
    }
    want = {
        r["fingerprint"]
        for r in incremental_exact_dedup(b1, day0.fingerprints).collect()
    }
    assert got == want and len(want) > 0


def test_purged_doc_reingest_is_readmitted(spark):
    """The bloom-after-purge exactness argument, executed: a doc purged on
    day 1 stays bloom-POSITIVE forever (blooms cannot delete), so its
    day-2 re-ingest must flow through the exact confirm and be correctly
    re-admitted — across every family. This is the case that would break
    if admission ever trusted the bloom's positive verdicts."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, _, _ = _three_way_split(docs)
    victim = corpus.filter(F.col("doc_id") % 100 == 1)
    n_victims = victim.count()
    assert n_victims > 0

    day0 = _checkpointed(daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K))
    empty = corpus.filter(F.lit(False))
    day1 = _checkpointed(
        daily_cycle_step(
            day0, empty, removed_docs=victim, m=_SMALL_M, k=_SMALL_K
        )
    )
    assert (
        day1.fingerprints.join(
            victim.select(
                F.md5(F.lower(F.trim("text"))).alias("fingerprint")
            ),
            "fingerprint",
            "semi",
        ).count()
        == 0
    )
    day2 = daily_cycle_step(day1, victim, m=_SMALL_M, k=_SMALL_K)
    # after re-ingest the stores equal a from-scratch build over the
    # original corpus again — the purge → re-admit round-trip is exact
    _assert_stores_equal(day2, daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K), skip_bloom=True)


def test_planted_duplicate_batch_admits_one_representative(spark):
    """Planted admission shapes the fixture can't produce: a byte-identical
    re-crawl of a corpus doc (must NOT be admitted anywhere), an in-batch
    duplicate pair (min-id representative only), and case/padding
    variants that normalize to the same fingerprint (one admission)."""
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"), (1, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact store dup
            (11, "lambda mu nu xi omicron"),  # novel pair rep (min id)
            (12, "lambda mu nu xi omicron"),  # in-batch dup of 11
            (13, "  LAMBDA MU NU XI OMICRON  "),  # normalizes to 11's fp
            (14, "pi rho sigma tau upsilon"),  # plain novel
        ],
        "doc_id long, text string",
    )
    day0 = _checkpointed(daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K))
    day1 = daily_cycle_step(day0, batch, m=_SMALL_M, k=_SMALL_K)
    admitted = {r["doc_id"] for r in day1.shingles.collect()} - {0, 1}
    assert admitted == {11, 14}
    assert day1.fingerprints.count() == 4  # 2 corpus + 2 novel
    # refcounts only count admitted docs (docs here are under the span
    # window so span_rc stays empty — consistency is pinned by the
    # fixture law and the hypothesis sweep on longer docs)


def test_cycle_scans_batch_text_exactly_once(spark):
    """The plan contract: with parquet-backed batch/takedown inputs and
    persisted (checkpointed) stores, every output store's optimized plan
    contains ZERO parquet relations — the one batch scan (and the one
    removed-docs scan) happened at the step's eager entry checkpoint,
    and nothing downstream re-reads any table; the corpus is never read
    at all (same pin family as test_delta_never_rescans_corpus_text)."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    day0 = _checkpointed(daily_stores_build(corpus))
    removed = corpus.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    day1 = daily_cycle_step(day0, b1, removed_docs=removed)
    for fname in day1._fields:
        plan = getattr(day1, fname)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Relation") == 0, f"{fname} re-scans a table:\n{plan}"
        assert "ExistingRDD" in plan or "LogicalRDD" in plan


# --- hypothesis sweep: the N-day cycle vs an exact Python model --------------

# Docs are concatenations of passages from a tiny pool, so exact dups
# within and across days are COMMON (random text never collides) and
# span windows genuinely share hashes across docs. The model replays
# admission (min-id per novel fingerprint, day order) and
# expansion-closed takedowns with plain set/dict arithmetic; Spark must
# agree on the fingerprint store exactly, and every derived family must
# equal a from-scratch build over the model's surviving doc set.

_POOL = [[f"w{p}t{i}" for i in range(11)] for p in range(4)]

_DOC = st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=3).map(
    lambda picks: " ".join(t for p in picks for t in _POOL[p])
)
# (text, day ∈ {0: corpus, 1, 2}, takedown-flag)
_CORPUS = st.lists(
    st.tuples(_DOC, st.integers(min_value=0, max_value=2), st.booleans()),
    min_size=1,
    max_size=8,
)


def _md5(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_daily_cycle_equals_python_model(spark_global, corpus):
    spark = spark_global
    rows = [(i, text, day, rm) for i, (text, day, rm) in enumerate(corpus)]
    schema = "doc_id long, text string"

    def frame(sel):
        return spark.createDataFrame([(i, t) for i, t, _, _ in sel], schema)

    day_docs = {d: [r for r in rows if r[2] == d] for d in (0, 1, 2)}

    # exact model: replay admission in day order
    store_fp = {_md5(t) for _, t, _, _ in day_docs[0]}
    doc_set = [(i, t) for i, t, _, _ in day_docs[0]]
    novel_per_day: dict[int, dict] = {}
    for d in (1, 2):
        novel: dict[str, int] = {}
        for i, t, _, _ in day_docs[d]:
            fp = _md5(t)
            if fp not in store_fp and (fp not in novel or i < novel[fp]):
                novel[fp] = i
        novel_per_day[d] = novel
        by_id = {i: t for i, t, _, _ in day_docs[d]}
        doc_set += [(i, by_id[i]) for i in sorted(novel.values())]
        store_fp |= set(novel)
    # expansion-closed takedown at end of day 2: every current holder of
    # a flagged doc's fingerprint leaves
    removed_fps = {_md5(t) for _, t, _, rm in rows if rm}
    removed = [(i, t) for i, t in doc_set if _md5(t) in removed_fps]
    doc_set = [(i, t) for i, t in doc_set if _md5(t) not in removed_fps]
    store_fp -= removed_fps

    day0 = _checkpointed(
        daily_stores_build(frame(day_docs[0]), m=_SMALL_M, k=_SMALL_K)
    )
    day1 = _checkpointed(
        daily_cycle_step(day0, frame(day_docs[1]), m=_SMALL_M, k=_SMALL_K)
    )
    day2, rep = daily_cycle_step(
        day1,
        frame(day_docs[2]),
        removed_docs=(
            spark.createDataFrame(removed, schema) if removed else None
        ),
        m=_SMALL_M,
        k=_SMALL_K,
        with_report=True,
    )

    got_fp = {r["fingerprint"] for r in day2.fingerprints.collect()}
    assert got_fp == store_fp
    want = daily_stores_build(
        spark.createDataFrame(doc_set, schema), m=_SMALL_M, k=_SMALL_K
    )
    _assert_stores_equal(day2, want, skip_bloom=bool(removed))

    # the audit row agrees with the model on every model-computable
    # field (the bloom SPLIT depends on bit state the model doesn't
    # carry; its partition arithmetic is what the model can check)
    r = rep.collect()[0]
    assert r["n_batch_docs"] == len(day_docs[2])
    assert r["n_batch_fps"] == len({_md5(t) for _, t, _, _ in day_docs[2]})
    assert r["n_admitted"] == len(novel_per_day[2])
    assert r["n_bloom_fast"] + r["n_suspects"] == r["n_batch_fps"]
    assert r["n_admitted"] == r["n_bloom_fast"] + r["n_bloom_false_positives"]
    assert r["n_removed_docs"] == len(removed)


def test_daily_cycle_is_streaming_transparent(spark, tmp_path):
    """Stream ≡ batch for the WHOLE composition (extending the per-store
    streaming-refresh family — HLL max, bloom or, histogram add,
    reservoir merge — to the composed cycle): folding daily_cycle_step
    over the micro-batches of a real file stream (the foreachBatch
    refresh a production ingest runs) lands on EXACTLY the from-scratch
    build over corpus ∪ streamed docs, every family, payloads included.
    Multiple micro-batches are forced (maxFilesPerTrigger=1 over a
    4-file layout) so the fold genuinely replays multi-day admission —
    the micro-batch boundary IS the day boundary at stream granularity."""
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    src = str(tmp_path / "ingest_stream")
    batch.repartition(4).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state = {"stores": _checkpointed(daily_stores_build(corpus))}

    def refresh(batch_df, _batch_id):
        state["stores"] = _checkpointed(
            daily_cycle_step(state["stores"], batch_df)
        )

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "stream collapsed into one micro-batch"

    want = daily_stores_build(corpus.unionByName(docs.filter(F.col("doc_id") % 10 == 0)))
    _assert_stores_equal(state["stores"], want, skip_bloom=False)


# --- embedding-side cycle laws ----------------------------------------------

from flink_stream_processing_spark.queries_impl.daily_cycle import (  # noqa: E402
    EmbeddingStores,
    centroid_vectors_from_state,
    embedding_cycle_step,
    embedding_stores_build,
)


def _eck(stores: EmbeddingStores) -> EmbeddingStores:
    return EmbeddingStores(*[df.localCheckpoint(eager=True) for df in stores])


def _assert_state_tracks_lists(spark, stores: EmbeddingStores, exact: bool):
    """THE cross-store invariant: the mergeable quantizer state equals a
    from-scratch rebuild over the lists — (label, dim, s, n) rows, s
    exactly on integer vectors (fp-tolerance on the real fixture)."""
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_centroid_state,
    )

    rebuilt = ivf_centroid_state(stores.lists)
    j = stores.state.select(
        "label", "dim", F.col("s").alias("s1"), F.col("n").alias("n1")
    ).join(rebuilt, ["label", "dim"], "full_outer")
    assert (
        j.filter(
            (F.col("n1") != F.col("n")) | F.col("n1").isNull() | F.col("n").isNull()
        ).count()
        == 0
    )
    tol = 0.0 if exact else 1e-6
    assert j.filter(F.abs(F.col("s1") - F.col("s")) > tol).count() == 0


def _int_vecs(spark, rows):
    """rows: [(vec_id, label_or_None, [ints])] — label None marks ingest."""
    return spark.createDataFrame(
        [(i, lbl, [float(x) for x in v]) for i, lbl, v in rows],
        "vec_id long, label int, embedding array<double>",
    )


def test_embedding_cycle_state_tracks_lists_exactly(spark):
    """Integer vectors make every sum exact, so the invariant is pinned
    with zero tolerance through append → append+takedown → takedown-only
    generations, including an emptied label dropping out of the state."""
    corpus = _int_vecs(
        spark,
        [(0, 0, [2, 4, 6]), (1, 0, [4, 8, 2]), (2, 1, [1, 3, 5]), (3, 2, [9, 9, 9])],
    )
    day0 = _eck(embedding_stores_build(corpus))
    _assert_state_tracks_lists(spark, day0, exact=True)

    # neither b1 vector may land on label 2 (centroid [9,9,9] attracts
    # anything near-uniform by cosine): [3,5,7] -> label 1 (0.983 vs
    # 0.95), [4,8,2] -> label 0 (0.95 vs 0.88)
    b1 = _int_vecs(spark, [(10, 0, [3, 5, 7]), (11, 0, [4, 8, 2])]).select(
        "vec_id", "embedding"
    )
    day1 = _eck(embedding_cycle_step(day0, b1))
    _assert_state_tracks_lists(spark, day1, exact=True)
    assert day1.lists.count() == 6

    # append + takedown in one step; vec 3 was label 2's only member —
    # the label must vanish from the state (emptied-list rule). The b2
    # vector is parallel to label 1's centroid (cosine 1.0), so it cannot
    # land on label 2 and keep it alive.
    b2 = _int_vecs(spark, [(12, 0, [1, 3, 5])]).select("vec_id", "embedding")
    removed = spark.createDataFrame([(3,), (10,)], "vec_id long")
    day2 = _eck(embedding_cycle_step(day1, b2, removed_ids=removed))
    _assert_state_tracks_lists(spark, day2, exact=True)
    assert day2.state.filter(F.col("label") == 2).count() == 0
    assert day2.lists.count() == 5


def test_embedding_state_quantizer_equals_rescan_quantizer(spark):
    """centroid_vectors_from_state(state) == ivf_centroids(lists) exactly
    on integer vectors — assigning against the O(labels × dims) state is
    indistinguishable from assigning against a full list rescan, which
    is the whole point of carrying the mergeable form."""
    from flink_stream_processing_spark.operators.similarity import ivf_centroids
    from flink_stream_processing_spark.queries_impl.store_maintenance import (
        ivf_centroid_state,
    )

    lists = _int_vecs(
        spark,
        [(0, 0, [2, 4, 6]), (1, 0, [4, 8, 2]), (2, 1, [1, 3, 5]), (3, 1, [7, 5, 3])],
    )
    got = centroid_vectors_from_state(ivf_centroid_state(lists))
    want = ivf_centroids(lists)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_embedding_cycle_append_remove_round_trip_on_fixture(spark):
    """Real-data round trip: ingest the fixture batch, take it down, land
    bit-exactly back on the corpus lists with the state still tracking
    (fp tolerance — float embeddings)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", "label", "embedding"
    )
    b1 = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    day0 = _eck(embedding_stores_build(corpus))
    day1 = _eck(embedding_cycle_step(day0, b1))
    _assert_state_tracks_lists(spark, day1, exact=False)
    removed = day1.lists.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    day2 = _eck(embedding_cycle_step(day1, b1.filter(F.lit(False)), removed_ids=removed))
    _assert_state_tracks_lists(spark, day2, exact=False)
    assert day2.lists.exceptAll(corpus).count() == 0
    assert corpus.exceptAll(day2.lists).count() == 0


def test_embedding_cycle_invariant_is_split_invariant(spark):
    """Assignment is deliberately order-sensitive (each day assigns
    against that day's quantizer — accepted IVF drift, documented), but
    the consistency invariant must hold at EVERY generation under ANY
    day slicing, and the ingested id set is slicing-independent."""
    corpus = _int_vecs(
        spark, [(0, 0, [5, 1, 1]), (1, 1, [1, 5, 1]), (2, 2, [1, 1, 5])]
    )
    batch_rows = [(10 + i, None, [1 + i % 3, 2 + i % 4, 3 + i % 5]) for i in range(9)]
    whole = _int_vecs(spark, [(i, 0, v) for i, _, v in batch_rows]).select(
        "vec_id", "embedding"
    )
    one_shot = _eck(embedding_cycle_step(_eck(embedding_stores_build(corpus)), whole))
    _assert_state_tracks_lists(spark, one_shot, exact=True)

    sliced = _eck(embedding_stores_build(corpus))
    for d in range(3):
        day_batch = _int_vecs(
            spark, [(i, 0, v) for i, _, v in batch_rows[d * 3 : (d + 1) * 3]]
        ).select("vec_id", "embedding")
        sliced = _eck(embedding_cycle_step(sliced, day_batch))
        _assert_state_tracks_lists(spark, sliced, exact=True)
    got_ids = sorted(r["vec_id"] for r in sliced.lists.collect())
    want_ids = sorted(r["vec_id"] for r in one_shot.lists.collect())
    assert got_ids == want_ids


def test_embedding_cycle_never_rescans_tables(spark):
    """Plan pin (the doc-cycle contract, vector side): with checkpointed
    stores and parquet-backed batch, both output frames' optimized plans
    contain zero parquet relations — the one batch scan happened at the
    entry checkpoint; the lists are consumed from their persisted form."""
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", "label", "embedding"
    )
    b1 = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    day1 = embedding_cycle_step(_eck(embedding_stores_build(corpus)), b1)
    for fname in day1._fields:
        plan = getattr(day1, fname)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Relation") == 0, f"{fname} re-scans a table:\n{plan}"
        assert "ExistingRDD" in plan or "LogicalRDD" in plan


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.lists(st.integers(min_value=1, max_value=5), min_size=3, max_size=3),
        ),
        min_size=1,
        max_size=5,
    ),
    batches=st.lists(
        st.lists(
            st.lists(st.integers(min_value=1, max_value=5), min_size=3, max_size=3),
            min_size=0,
            max_size=3,
        ),
        min_size=1,
        max_size=2,
    ),
    removals=st.sets(st.integers(min_value=0, max_value=10), max_size=4),
)
def test_embedding_cycle_invariant_sweep(spark_global, corpus, batches, removals):
    """Random-shape sweep of the cross-store invariant: any sequence of
    appends and (membership-filtered) takedowns keeps
    state == ivf_centroid_state(lists) EXACTLY — integer vectors, so the
    full_outer edge cases (brand-new labels, emptied labels, empty
    batches, empty removals) are all exercised with zero tolerance."""
    spark = spark_global
    stores = _eck(
        embedding_stores_build(
            _int_vecs(spark, [(i, lbl, v) for i, (lbl, v) in enumerate(corpus)])
        )
    )
    next_id = len(corpus)
    for day, vecs in enumerate(batches):
        batch = _int_vecs(
            spark, [(next_id + j, 0, v) for j, v in enumerate(vecs)]
        ).select("vec_id", "embedding")
        next_id += len(vecs)
        rm = None
        if day == len(batches) - 1 and removals:
            # membership-filtered: the caller contract says ids ⊆ lists
            rm = stores.lists.filter(
                F.col("vec_id").isin(sorted(removals))
            ).select("vec_id")
        stores = _eck(embedding_cycle_step(stores, batch, removed_ids=rm))
        _assert_state_tracks_lists(spark, stores, exact=True)


def test_daily_cycle_report_counts_planted_batch_exactly(spark):
    """The audit row (compaction_report's analog for the composed cycle):
    exact values on the planted-duplicate batch — screen partition
    arithmetic (fast + suspects == batch fps; admitted == fast + false
    positives), admission counts, and the takedown observables — plus
    all-zeros on an empty day. A huge bitmap forces zero false
    positives so every field is closed-form."""
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"), (1, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact store dup
            (11, "lambda mu nu xi omicron"),  # novel rep
            (12, "lambda mu nu xi omicron"),  # in-batch dup of 11
            (13, "pi rho sigma tau upsilon"),  # plain novel
        ],
        "doc_id long, text string",
    )
    big_m = 1 << 20
    day0 = _checkpointed(daily_stores_build(corpus, m=big_m))
    removed = corpus.filter(F.col("doc_id") == 1)
    day1, rep = daily_cycle_step(
        day0, batch, removed_docs=removed, m=big_m, with_report=True
    )
    r = rep.collect()[0].asDict()
    assert r == {
        "n_batch_docs": 4,
        "n_batch_fps": 3,  # 11/12 share a fingerprint
        "n_bloom_fast": 2,  # both novel fps screen clean at m=2^20
        "n_suspects": 1,  # the true dup
        "n_bloom_false_positives": 0,
        "n_admitted": 2,
        "n_removed_docs": 1,
        "n_span_keys_purged": 0,  # 5-token docs are under the span window
        "n_span_keys_protected": 0,
        "n_span_keys_overdecremented": 0,
    }
    # arithmetic invariants hold on real data at a hostile fill ratio too
    docs = load_table(spark, SF_DIR, "documents")
    c2, b2, _ = _three_way_split(docs)
    d0 = _checkpointed(daily_stores_build(c2, m=_SMALL_M, k=_SMALL_K))
    _, rep2 = daily_cycle_step(d0, b2, m=_SMALL_M, k=_SMALL_K, with_report=True)
    r2 = rep2.collect()[0]
    assert r2["n_bloom_fast"] + r2["n_suspects"] == r2["n_batch_fps"]
    assert r2["n_admitted"] == r2["n_bloom_fast"] + r2["n_bloom_false_positives"]
    assert r2["n_bloom_false_positives"] > 0  # the small bitmap really is hostile


def test_daily_cycle_over_persisted_generations(spark, tmp_path):
    """The production loop nothing else pins: write day-0's stores to
    disk — the key-bucketed layout the docstrings promise (fingerprints
    bucketed on fingerprint, span_rc on h) — read them back, and run
    day 1 FROM THE READ-BACK. Results must equal the in-memory path
    bit-for-bit (schema fidelity across the parquet round trip: bloom
    longs, shingle arrays, span hashes). Physically, the bucketed
    fingerprint store must feed the exact-confirm anti-join with NO
    exchange on the store side — one Exchange total (the small suspect
    side) vs two on an unbucketed control."""
    import uuid

    from flink_stream_processing_spark.operators.relational import bucketed_write
    from flink_stream_processing_spark.plans import formatted_plan

    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, _ = _three_way_split(docs)
    day0 = _checkpointed(daily_stores_build(corpus))
    want = daily_cycle_step(day0, b1)

    suffix = uuid.uuid4().hex[:8]
    names = {}
    try:
        for fname, key in (("fingerprints", "fingerprint"), ("span_rc", "h")):
            names[fname] = f"cycle_{fname}_{suffix}"
            bucketed_write(
                getattr(day0, fname), names[fname], key, 8, str(tmp_path / fname)
            )
        for fname in ("bloom", "bands", "shingles"):
            getattr(day0, fname).write.parquet(str(tmp_path / fname))

        persisted = DailyStores(
            fingerprints=spark.table(names["fingerprints"]),
            bloom=spark.read.parquet(str(tmp_path / "bloom")),
            bands=spark.read.parquet(str(tmp_path / "bands")),
            shingles=spark.read.parquet(str(tmp_path / "shingles")),
            span_rc=spark.table(names["span_rc"]),
        )
        got = daily_cycle_step(persisted, b1)
        _assert_stores_equal(got, want, skip_bloom=False)

        # physical layout: the bucketed store side of the exact confirm
        # joins without its own Exchange. Disable broadcast so the join
        # shape is the question, not the fixture size.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            suspects = b1.select(
                F.md5(F.lower(F.trim("text"))).alias("fingerprint")
            ).distinct()
            confirm = suspects.join(
                spark.table(names["fingerprints"]), "fingerprint", "left_anti"
            )
            import re

            plan = formatted_plan(confirm)
            # count DISTINCT Exchange nodes in the plan tree (the details
            # section re-prints each node, so a raw substring count lies)
            ex = set(re.findall(r"Exchange \((\d+)\)", plan))
            assert len(ex) == 1, plan
            control = suspects.join(
                day0.fingerprints, "fingerprint", "left_anti"
            )
            ex_ctl = set(re.findall(r"Exchange \((\d+)\)", formatted_plan(control)))
            assert len(ex_ctl) >= 2
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_duplicate_bootstrap_admits_representatives(spark):
    """r18 ADVICE closure: daily_stores_build applies the cycle's min-id
    representative rule unconditionally, so a bootstrap corpus
    CONTAINING byte-identical duplicates builds exactly the stores the
    incremental admission path would have produced — (a) bit-equal per
    family to building over the pre-deduped corpus, and (b) the cycle
    law holds FROM a duplicate bootstrap (day-1 over the dup bootstrap
    == from-scratch over survivors + day-1 admissions)."""
    dup_corpus = spark.createDataFrame(
        [
            (3, "alpha beta gamma delta epsilon"),
            (7, "alpha beta gamma delta epsilon"),  # byte-identical dup
            (5, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    deduped = dup_corpus.filter(F.col("doc_id") != 7)
    got = daily_stores_build(dup_corpus, m=_SMALL_M, k=_SMALL_K)
    want = daily_stores_build(deduped, m=_SMALL_M, k=_SMALL_K)
    _assert_stores_equal(got, want, skip_bloom=False)
    # doc-keyed tables carry ONLY the min-id representative
    assert {r["doc_id"] for r in got.bands.select("doc_id").distinct().collect()} <= {3, 5}

    batch = spark.createDataFrame(
        [(11, "lambda mu nu xi omicron")], "doc_id long, text string"
    )
    day1 = daily_cycle_step(
        _checkpointed(got), batch, m=_SMALL_M, k=_SMALL_K
    )
    scratch = daily_stores_build(
        deduped.unionByName(batch), m=_SMALL_M, k=_SMALL_K
    )
    _assert_stores_equal(day1, scratch, skip_bloom=False)


def test_raw_corpus_takedown_expansion_is_observable(spark):
    """r18 ADVICE closure: a takedown expansion wired over the RAW corpus
    (including a non-admitted byte-identical dup whose spans were never
    appended) over-decrements shared span refcounts — the audit row's
    n_span_keys_overdecremented column must expose it (and reads zero
    under the correct membership-closed expansion)."""
    # docs must clear the _SPAN_W=20 window: 25 tokens, with doc 5
    # sharing exactly the first 20-token run (one shared window key) and
    # docs 3/7 byte-identical (doc 7 is NOT admitted). Doc 3's windows
    # past the shared prefix have n_holders == 1, so a raw-corpus
    # takedown of {3, 7} decrements them twice -> n_after == -1.
    base = [f"w{i}" for i in range(1, 21)]
    t_shared = " ".join(base + ["a1", "a2", "a3", "a4", "a5"])
    t_other = " ".join(base + ["b1", "b2", "b3"])
    corpus = spark.createDataFrame(
        [(3, t_shared), (7, t_shared), (5, t_other)],
        "doc_id long, text string",
    )
    stores = _checkpointed(daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K))
    empty = corpus.filter(F.lit(False))

    # CORRECT: expansion over store membership (admitted survivors = {3})
    member_removed = corpus.filter(F.col("doc_id") == 3)
    _, rep_ok = daily_cycle_step(
        stores, empty, removed_docs=member_removed,
        m=_SMALL_M, k=_SMALL_K, with_report=True,
    )
    assert rep_ok.collect()[0]["n_span_keys_overdecremented"] == 0

    # WRONG: expansion over the raw corpus — doc 7's spans were never
    # appended, so shared keys decrement twice for one append
    raw_removed = corpus.filter(F.col("doc_id").isin(3, 7))
    _, rep_bad = daily_cycle_step(
        stores, empty, removed_docs=raw_removed,
        m=_SMALL_M, k=_SMALL_K, with_report=True,
    )
    assert rep_bad.collect()[0]["n_span_keys_overdecremented"] > 0


def test_cbf_screen_cycle_law_includes_the_screen(spark):
    """r19 capability: with screen="cbf" the cycle law extends to the
    SCREEN ITSELF — after appends AND takedowns, the persisted counter
    state equals a from-scratch CBF build over the surviving fingerprint
    store, counter-identical, with no rebuild pass (the bitmap family
    needs skip_bloom here and rebuild_bloom for hygiene)."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus, b1, b2 = _three_way_split(docs)

    day0 = _checkpointed(daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K, screen="cbf"))
    day1 = _checkpointed(
        daily_cycle_step(day0, b1, m=_SMALL_M, k=_SMALL_K, screen="cbf")
    )
    held = corpus.unionByName(b1)
    removed = held.filter(F.col("doc_id") % 10 == _TOMBSTONE_RESIDUE)
    day2 = daily_cycle_step(
        day1, b2, removed_docs=removed, m=_SMALL_M, k=_SMALL_K, screen="cbf"
    )
    final_docs = held.join(
        removed.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(b2)
    want = daily_stores_build(final_docs, m=_SMALL_M, k=_SMALL_K, screen="cbf")
    # NO skip_bloom: the screen is part of the equality now
    _assert_stores_equal(day2, want, skip_bloom=False)


def test_cbf_screen_restores_fast_path_after_purge(spark):
    """The operational win over the bitmap: a purged doc's re-ingest is
    screen-NEGATIVE again under cbf (fast path, zero store probes),
    where the bitmap keeps it suspect forever. Same admission either
    way (exactness law) — only the suspect mass differs, and the audit
    row shows it."""
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"), (1, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    victim = corpus.filter(F.col("doc_id") == 1)
    empty = corpus.filter(F.lit(False))
    big_m = 1 << 20  # negligible FPR so the fast/suspect split is exact

    for screen, want_suspects in (("bloom", 1), ("cbf", 0)):
        day0 = _checkpointed(daily_stores_build(corpus, m=big_m, screen=screen))
        day1 = _checkpointed(
            daily_cycle_step(day0, empty, removed_docs=victim, m=big_m, screen=screen)
        )
        day2, rep = daily_cycle_step(
            day1, victim, m=big_m, with_report=True, screen=screen
        )
        r = rep.collect()[0]
        assert r["n_admitted"] == 1, screen  # exactness either way
        assert r["n_suspects"] == want_suspects, screen
        # both screens converge to the same fingerprint store
        assert {x["fingerprint"] for x in day2.fingerprints.collect()} == {
            x["fingerprint"]
            for x in daily_stores_build(corpus, m=big_m).fingerprints.collect()
        }


def test_cbf_cycle_is_streaming_transparent_with_takedowns(spark, tmp_path):
    """Stream ≡ batch for the CBF-screened cycle WITH a mid-stream
    takedown: folding daily_cycle_step(screen="cbf") over a real file
    stream's micro-batches, applying a takedown on one of them, lands
    EXACTLY on the from-scratch CBF build over the survivors — screen
    INCLUDED (the bitmap variant must skip the screen here; the
    counting screen follows the store through stream-granularity
    takedowns with no rebuild)."""
    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        _stream_session,
    )

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    streamed = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    # the takedown: a slice of the ORIGINAL corpus, expansion-closed by
    # the fixture's no-cross-dup property
    removed = corpus.filter(F.col("doc_id") % 100 == 7).select("doc_id", "text")
    n_removed = removed.count()
    assert n_removed > 0

    src = str(tmp_path / "cbf_ingest_stream")
    streamed.repartition(3).write.parquet(src)

    s = _stream_session(spark)
    stream = s.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    state = {
        "stores": _checkpointed(
            daily_stores_build(corpus, m=_SMALL_M, k=_SMALL_K, screen="cbf")
        ),
        "takedown_done": False,
    }

    def refresh(batch_df, _batch_id):
        rm = None
        if not state["takedown_done"]:
            rm = removed  # first micro-batch day also processes the takedown
            state["takedown_done"] = True
        state["stores"] = _checkpointed(
            daily_cycle_step(
                state["stores"],
                batch_df,
                removed_docs=rm,
                m=_SMALL_M,
                k=_SMALL_K,
                screen="cbf",
            )
        )

    q = stream.writeStream.foreachBatch(refresh).trigger(availableNow=True).start()
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "stream collapsed into one micro-batch"

    survivors = (
        corpus.select("doc_id", "text")
        .join(removed.select("doc_id"), "doc_id", "left_anti")
        .unionByName(streamed)
    )
    want = daily_stores_build(survivors, m=_SMALL_M, k=_SMALL_K, screen="cbf")
    _assert_stores_equal(state["stores"], want, skip_bloom=False)
