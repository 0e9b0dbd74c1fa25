"""Semantic tests for the r11 web-dedup additions beyond the driver's
oracle gate: span exactness/maximality recomputed from raw text, and
streaming/batch agreement on the canonical-URL key set."""

from __future__ import annotations

import re

from flink_stream_processing_spark.queries import QUERIES

from .conftest import SF_DIR

SF_SMALL = "/root/testdata/sf0.001"


def test_cross_doc_spans_are_exact_and_maximal(spark):
    """Every reported span must be an EXACT shared token run between the
    two documents, and MAXIMAL: extending one token left or right either
    leaves a document's bounds or breaks equality. Recomputed from the
    raw text in Python — independent of both the Spark plan and the
    DuckDB oracle construction."""
    spans = QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect()
    assert len(spans) > 0, "fixture corpus is known to contain shared spans"

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for row in spans:
        a, b = docs[row["doc_a"]], docs[row["doc_b"]]
        sa, sb, ln = row["start_a"], row["start_b"], row["len_tokens"]
        assert ln >= 20
        assert a[sa : sa + ln] == b[sb : sb + ln], row
        left_open = sa > 0 and sb > 0
        if left_open:
            assert a[sa - 1] != b[sb - 1], f"span extends left: {row}"
        right_open = sa + ln < len(a) and sb + ln < len(b)
        if right_open:
            assert a[sa + ln] != b[sb + ln], f"span extends right: {row}"


def test_cross_doc_spans_pairs_are_cross_document(spark):
    for row in QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect():
        assert row["doc_a"] < row["doc_b"]


def test_duplicate_span_texts_match_both_documents(spark):
    """The surfaced span_text must equal the corresponding token slice of
    BOTH documents (the query reconstructs from doc_a only; equality with
    doc_b is the cross-document guarantee the span stands for)."""
    rows = QUERIES["duplicate_span_texts"](spark, SF_DIR).collect()
    assert len(rows) > 0
    # Key by the FULL identifying tuple (r11 advice): doc_b may contain
    # the same shared run at two offsets — two spans differing only in
    # start_b (possibly with different len_tokens) — and a
    # (doc_a, doc_b, start_a)-keyed dict would overwrite one and compare
    # a span_text row against the wrong span's start_b/len.
    spans: dict[tuple, list] = {}
    for s in QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect():
        spans.setdefault(
            (s["doc_a"], s["doc_b"], s["start_a"], s["len_tokens"]), []
        ).append(s)
    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        key = (r["doc_a"], r["doc_b"], r["start_a"], r["len_tokens"])
        assert key in spans, f"span_text row without a span: {r}"
        a_slice = docs[r["doc_a"]][r["start_a"] : r["start_a"] + r["len_tokens"]]
        assert r["span_text"] == " ".join(a_slice)
        # cross-document guarantee: SOME span with this key has a doc_b
        # slice equal to the surfaced text (any entry, per the advice)
        assert any(
            " ".join(
                docs[s["doc_b"]][s["start_b"] : s["start_b"] + s["len_tokens"]]
            )
            == r["span_text"]
            for s in spans[key]
        ), f"no span's doc_b slice matches: {r}"


def test_streaming_hot_hosts_partitions_the_corpus(spark):
    """Windowed per-host counts must partition the corpus exactly: summing
    n_docs over all (window, host) cells recovers the document count, and
    every host is a canonicalized one (no scheme/www./port residue)."""
    rows = QUERIES["streaming_hot_hosts"](spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert not r["host"].startswith("www.")
        assert ":" not in r["host"]
        assert r["host"] == r["host"].lower()


def test_streaming_content_dedup_matches_batch_fingerprints(spark):
    streamed = {
        r["content_fp"]
        for r in QUERIES["streaming_content_dedup"](spark, SF_SMALL).collect()
    }
    import hashlib

    batch = {
        hashlib.md5(
            re.sub(r"\s+", " ", r["text"].strip().lower()).encode()
        ).hexdigest()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("text")
        .collect()
    }
    assert streamed == batch


def test_streaming_url_dedup_matches_batch_key_set(spark):
    """The streamed first-sight key set must equal the batch canonical-URL
    key set (the composition contract: the same normalizer expression
    feeds both plans, and the watermark horizon out-spans the corpus so
    no key can be dropped or re-emitted)."""
    streamed = {
        r["canonical_url"]
        for r in QUERIES["streaming_url_dedup"](spark, SF_SMALL).collect()
    }
    batch = {
        r["canonical_url"]
        for r in QUERIES["url_normalize_dedup"](spark, SF_SMALL).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def _tok_df(spark, rows):
    """(doc_id, text) fixture -> the (doc_id, toks, n_tokens) frame
    maximal_shared_spans consumes, under the corpus tokenization."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return df.select("doc_id", toks.alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_maximal_shared_spans_fixture_exact(spark):
    """A planted 25-token run flanked by differing tokens must come back
    as exactly one span row with exact offsets and length."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    shared = _words("s", 25)
    rows = [
        (1, _words("a", 3) + " " + shared + " " + _words("z", 4)),
        (2, _words("b", 7) + " " + shared + " " + _words("y", 2)),
        (3, _words("c", 40)),  # no overlap with anyone
    ]
    out = maximal_shared_spans(_tok_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["len_tokens"]) == (3, 7, 25)


def test_maximal_shared_spans_two_runs_same_diagonal(spark):
    """Two distinct shared runs on the SAME alignment diagonal, separated
    by a differing gap, must stay two spans (the island split on gap>1)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    run1, run2 = _words("p", 22), _words("q", 20)
    rows = [
        (1, run1 + " gapone1 " + run2),
        (2, run1 + " gaptwo2 " + run2),
    ]
    out = sorted(
        maximal_shared_spans(_tok_df(spark, rows)).collect(),
        key=lambda r: r["start_a"],
    )
    assert [(r["start_a"], r["len_tokens"]) for r in out] == [(0, 22), (23, 20)]


def test_maximal_shared_spans_short_docs_empty(spark):
    """Docs below the window length produce no windows and no spans (the
    sequence() guard — an unguarded descending sequence would throw)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    rows = [(1, _words("a", 19)), (2, _words("a", 19)), (3, "one")]
    assert maximal_shared_spans(_tok_df(spark, rows)).collect() == []


def test_maximal_shared_spans_hot_bucket_guard_fires(spark):
    """A window hash whose multiplicity exceeds max_mult must fail LOUDLY
    with the remediation message, never expand O(cnt^2) silently."""
    import pytest

    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
    )

    boiler = _words("w", 20)
    rows = [(i, boiler) for i in range(5)]  # multiplicity 5 > max_mult 4
    with pytest.raises(Exception, match="multiplicity over 4"):
        maximal_shared_spans(_tok_df(spark, rows), max_mult=4).collect()


def test_strip_spans_broadcast_budget_guard_fires(spark):
    """An over-budget interval frame must fail LOUDLY with the named
    budget message (r12 verdict: span count scales with duplication mass,
    so a forced broadcast without a size guard OOMs the driver on a
    heavily-duplicated corpus instead of failing named)."""
    import pytest

    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
        strip_spans,
    )

    # Two distinct duplicated passages -> 2 spans -> 2 interval rows > 1.
    run1, run2 = _words("a", 25), _words("b", 25)
    base = _tok_df(
        spark,
        [(1, run1), (2, run1), (3, run2), (4, run2)],
    )
    spans = maximal_shared_spans(base)
    with pytest.raises(
        Exception, match=r"strip_duplicate_spans: span-frame broadcast budget"
    ):
        strip_spans(base, spans, broadcast_budget=1).collect()


def test_broadcast_guard_passes_through_under_budget(spark):
    """Under budget the guard is a pure pass-through: same rows out, and
    the outer join still plans as a broadcast hash join on the FRAME path
    too (the scalar mass ride-in and the when-wrapped join key must not
    demote the join to a shuffle — only the table-path query is pinned in
    test_plans.py)."""
    from flink_stream_processing_spark.plans import formatted_plan
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        maximal_shared_spans,
        strip_spans,
    )

    run = _words("c", 30)
    base = _tok_df(spark, [(1, run), (2, run)])
    spans = maximal_shared_spans(base)
    stripped = strip_spans(base, spans)
    out = stripped.collect()
    assert [(r["doc_id"], r["removed_tokens"]) for r in out] == [(2, 30)]
    plan = formatted_plan(stripped)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


# ---------------------------------------------------------------------------
# r12 adds


def test_strip_duplicate_spans_excises_exactly_the_covered_positions(spark):
    """The rewrite must equal the original token sequence with precisely
    the positions covered by some (doc as doc_b) span removed — coverage
    recomputed in Python from the span query, independent of the Spark
    interval filter and the oracle's EXISTS."""
    rows = {r["doc_id"]: r for r in QUERIES["strip_duplicate_spans"](spark, SF_DIR).collect()}
    assert len(rows) > 0
    spans = QUERIES["cross_doc_duplicate_spans"](spark, SF_DIR).collect()
    cover: dict[int, set[int]] = {}
    for s in spans:
        cover.setdefault(s["doc_b"], set()).update(
            range(s["start_b"], s["start_b"] + s["len_tokens"])
        )
    assert set(rows) == set(cover), "output must be exactly the affected docs"
    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r["doc_id"] in cover
    }
    for doc_id, out in rows.items():
        toks = docs[doc_id]
        keep = [t for i, t in enumerate(toks) if i not in cover[doc_id]]
        assert out["n_tokens"] == len(toks)
        assert out["removed_tokens"] == len(cover[doc_id])
        assert out["clean_text"] == " ".join(keep)
        assert out["removed_tokens"] > 0


def test_span_coverage_profile_is_monotone_in_window_size(spark):
    """A duplicated W-window's leading (W/2)-subwindow is also duplicated,
    so mapping each dup window to its prefix is injective: dup counts are
    non-increasing in W (10 >= 20 >= 40), and every profile row is
    internally consistent (dup_windows <= total_windows, dup_hashes <=
    dup_windows, docs_affected >= 2 wherever any dup exists)."""
    prof = {
        r["window_w"]: r
        for r in QUERIES["span_coverage_profile"](spark, SF_DIR).collect()
    }
    assert sorted(prof) == [10, 20, 40]
    assert prof[10]["dup_windows"] >= prof[20]["dup_windows"] >= prof[40]["dup_windows"]
    for r in prof.values():
        assert r["dup_windows"] <= r["total_windows"]
        assert r["dup_hashes"] <= r["dup_windows"]
        if r["dup_windows"] > 0:
            assert r["docs_affected"] >= 1


def test_streaming_crawl_pipeline_counts_closed_window_urls_once(spark):
    """Composition check: the chained dedup->window pipeline must count
    each canonical URL at most once (sum of n_urls <= distinct canonical
    URLs), and every host must be a canonicalized one."""
    rows = QUERIES["streaming_crawl_pipeline"](spark, SF_SMALL).collect()
    distinct_urls = QUERIES["streaming_url_dedup"](spark, SF_SMALL).count()
    assert 0 < sum(r["n_urls"] for r in rows) <= distinct_urls
    for r in rows:
        assert not re.match(r"^(https?://|www\.)", r["host"]), r
        assert ":" not in r["host"]


def test_streaming_host_sessions_partition_and_gap(spark):
    """Sessions must partition each host's doc count exactly, and
    consecutive sessions of one host must be separated by >= the 15 s
    gap (otherwise they would have merged)."""
    rows = QUERIES["streaming_host_sessions"](spark, SF_SMALL).collect()
    per_host: dict[str, list] = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r)
    total = sum(r["n_docs"] for r in rows)
    assert total == spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    for host, sess in per_host.items():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            assert b["session_start"] >= a["session_end"], (host, a, b)


def test_url_frontier_topk_is_top3_per_host_by_priority(spark):
    rows = QUERIES["url_frontier_topk"](spark, SF_SMALL).collect()
    per_host: dict[str, list] = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r)
    for host, lst in per_host.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 3
        pris = [r["priority"] for r in lst]
        assert pris == sorted(pris)


def test_crawl_pipeline_single_batch_precondition():
    """streaming_crawl_pipeline's dedup horizon (10 min) is narrower than
    its md5 schedule span (1 day), so its oracle equality requires the
    finite fixture to arrive in ONE micro-batch (see the query docstring).
    Pin the structural guarantees: the stream dir holds exactly one
    parquet FILE (a file source cannot split one file across batches),
    it resolves to a regular file (not a multi-part directory), and the
    fixture itself is a single file at every test SF."""
    import os

    from flink_stream_processing_spark.queries_impl._stream_helpers import (
        table_stream_dir,
    )

    for sf in (SF_SMALL, SF_DIR):
        d = table_stream_dir(sf, "documents")
        entries = sorted(e for e in os.listdir(d) if not e.startswith("."))
        assert entries == ["documents.parquet"], entries
        assert os.path.isfile(os.path.join(d, "documents.parquet"))


def test_crawl_pipeline_runs_exactly_one_data_batch(spark):
    """The behavioral half of the single-batch precondition (r12 advice):
    the structural pin above cannot catch a future Spark change to
    availableNow admission for file sources (e.g. byte-based file
    splitting), so also assert what the run actually DID — exactly one
    micro-batch carried input rows (the trailing zero-row batch only
    advances the watermark to flush closed windows)."""
    from flink_stream_processing_spark.queries_impl import _stream_helpers as sh

    n = QUERIES["streaming_crawl_pipeline"](spark, SF_SMALL).count()
    assert n > 0
    # The batch-count record is only evidence if it is COMPLETE — past
    # the recentProgress ring cap the earliest entries rotate out and
    # this assertion would run on a truncated record (r13 advice).
    assert sh.last_stream_batches_complete, (
        "recentProgress hit its ring cap; batch-count record truncated"
    )
    data_batches = [b for b in sh.last_stream_batches if b > 0]
    assert len(data_batches) == 1, sh.last_stream_batches


def test_stream_progress_record_resets_on_failure(spark, monkeypatch):
    """r15 advice: a failed/timed-out run must not leave the PREVIOUS
    run's complete=True + batch list behind — a consumer inspecting after
    the failure would read a stale record as evidence. The helpers reset
    both globals up front and set them only on the success path."""
    import pytest

    from flink_stream_processing_spark.queries_impl import _stream_helpers as sh

    # seed a "previous successful run" record
    sh.last_stream_batches[:] = [123]
    sh.last_stream_batches_complete = True

    def boom(agg, name, output_mode):
        raise RuntimeError("sink construction failed")

    import flink_stream_processing_spark.streaming.pipeline as pl

    monkeypatch.setattr(pl, "write_memory", boom)
    dummy = spark.readStream.format("rate").load().selectExpr("value AS v")
    with pytest.raises(RuntimeError, match="sink construction failed"):
        sh._run_stream_to_table(dummy, "append")
    assert sh.last_stream_batches == []
    assert sh.last_stream_batches_complete is False


# ---------------------------------------------------------------------------
# r13 adds


def test_incremental_strip_excises_planted_corpus_passage(spark):
    """A new doc containing a passage already in the corpus store loses
    exactly that passage; its unique text survives; an unaffected new doc
    is absent from the output (affected-docs-only contract)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        incremental_strip_new_docs,
        span_hash_store,
    )

    passage = _words("dup", 30)
    corpus = _tok_df(spark, [(1, "lead " + passage + " tail")])
    unique = _words("new", 10)
    batch = _tok_df(
        spark,
        [(10, unique + " " + passage), (20, _words("clean", 25))],
    )
    store = span_hash_store(corpus).localCheckpoint(eager=True)
    out = {r["doc_id"]: r for r in incremental_strip_new_docs(batch, store).collect()}
    assert set(out) == {10}  # doc 20 untouched -> absent
    r = out[10]
    assert r["n_tokens"] == 40 and r["removed_tokens"] == 30
    assert r["clean_text"] == unique


def test_incremental_strip_ignores_batch_internal_duplication(spark):
    """Two NEW docs sharing a passage that the corpus has never seen must
    both pass through unstripped: the store side of every match is
    corpus-by-construction (batch-internal dedup is the batch's own
    strip pass, not the incremental operator's job)."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        incremental_strip_new_docs,
        span_hash_store,
    )

    corpus = _tok_df(spark, [(1, _words("corp", 30))])
    shared = _words("batchdup", 25)
    batch = _tok_df(spark, [(10, shared), (20, shared)])
    store = span_hash_store(corpus).localCheckpoint(eager=True)
    assert incremental_strip_new_docs(batch, store).collect() == []


def test_politeness_schedule_paces_rank3_one_window_later(spark):
    """The pacing arithmetic: entries pace ceil(rank / quota) full
    windows after the host's own last observed window (with the shipped
    quota 2: ranks 1-2 share the first slot, rank 3 lands one later).
    The quota is IMPORTED — the query and its oracle both interpolate
    _POLITENESS_QUOTA, so a constant change must not turn this test into
    a false alarm."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        _POLITENESS_QUOTA as Q,
        _POLITENESS_WINDOW_MS as W_MS,
    )

    rows = QUERIES["politeness_frontier_schedule"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    hot = QUERIES["streaming_hot_hosts"](spark, SF_SMALL).collect()
    last = {}
    for r in hot:
        last[r["host"]] = max(last.get(r["host"], 0), r["window_start"])
    for r in rows:
        slot = (r["rank"] + Q - 1) // Q
        assert r["scheduled_start"] == last[r["host"]] + W_MS * slot, r


def test_politeness_schedule_quota_law_on_synthetic_frontier(spark):
    """The quota law on the frame-level operator with ranks past 3 (the
    query caps at rank<=3; the operator must hold for ANY ranked
    frontier): at most `quota` entries share a (host, scheduled_start),
    slots fill in rank order, and every schedule lands strictly after the
    host's last observed window."""
    from collections import Counter

    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        politeness_schedule,
    )

    ranked = spark.createDataFrame(
        [
            ("h1", f"https://h1/u{r}", 100 + r, r)
            for r in range(1, 8)  # 7 entries -> slots 1,1,2,2,3,3,4
        ]
        + [("h2", "https://h2/u1", 5, 1)],
        "host string, canonical_url string, priority long, rank long",
    )
    load = spark.createDataFrame(
        [("h1", 1_000_000, 40), ("h2", 2_000_000, 7)],
        "host string, last_window_start long, observed_docs long",
    )
    rows = politeness_schedule(ranked, load, quota=2, window_ms=600_000).collect()
    assert len(rows) == 8
    last = {"h1": 1_000_000, "h2": 2_000_000}
    per_slot = Counter((r["host"], r["scheduled_start"]) for r in rows)
    assert max(per_slot.values()) <= 2, per_slot
    for r in rows:
        assert r["scheduled_start"] > last[r["host"]], r
        expected_slot = (r["rank"] + 1) // 2
        assert r["scheduled_start"] == last[r["host"]] + 600_000 * expected_slot, r


# ---------------------------------------------------------------------------
# r15: guard-cache release contract + _bc_mass collision guard (r13 advice)


def _persistent_rdd_ids(spark):
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(int(it.next()._1()))
    return ids


def test_guard_caches_release_leaves_no_net_new_blocks(spark):
    """The library-caller release contract: a sweep of the span queries
    that cache through _guard_cache, followed by release_guard_caches(),
    restores the session's persistent-RDD set — no accumulating blocks
    for callers outside bench.py's per-query release machinery."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        release_guard_caches,
    )

    release_guard_caches(blocking=True)  # drain whatever earlier tests left
    before = _persistent_rdd_ids(spark)
    assert QUERIES["duplicate_span_texts"](spark, SF_SMALL).count() >= 0
    assert QUERIES["strip_duplicate_spans"](spark, SF_SMALL).count() >= 0
    assert len(_persistent_rdd_ids(spark) - before) >= 1  # caches were live
    released = release_guard_caches(blocking=True)
    assert released >= 2, released
    assert _persistent_rdd_ids(spark) - before == set()


def test_guard_cache_registry_prunes_externally_released_entries(spark):
    """r15 advice: bench.py/the driver unpersist guard blocks through
    their own RDD-level machinery without calling release_guard_caches(),
    so registration must prune dead references — the registry is bounded
    by LIVE caches, not by process-lifetime query count, and a later
    release never double-unpersists an externally released frame."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        _GUARD_CACHES,
        _guard_cache,
        release_guard_caches,
    )

    release_guard_caches(blocking=True)
    a = _guard_cache(spark.range(5).selectExpr("id AS k"))
    a.count()
    assert len(_GUARD_CACHES) == 1
    # external machinery (bench.py's scoped release) unpersists directly
    a.unpersist(True)
    # the NEXT registration prunes the dead entry: only the new frame stays
    b = _guard_cache(spark.range(7).selectExpr("id AS k"))
    b.count()
    assert len(_GUARD_CACHES) == 1 and _GUARD_CACHES[0] is b
    assert release_guard_caches(blocking=True) == 1


def test_guard_cache_prune_keeps_entry_on_transient_probe_failure(spark):
    """r16 advice: a storageLevel probe that raises on a LIVE session
    (transient Py4J hiccup) must KEEP its registry entry — dropping it
    would let a still-persisted block escape release_guard_caches() for
    the process lifetime. Only a genuinely dead session/handle licenses
    the unseen drop."""
    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        _GUARD_CACHES,
        _guard_cache,
        _prune_released_guard_caches,
        release_guard_caches,
    )

    class _FlakyProbe:
        """Wraps a live cached frame; raises on the FIRST storageLevel
        probe (the transient error), then delegates."""

        def __init__(self, df):
            self._df = df
            self.probes = 0

        @property
        def storageLevel(self):
            self.probes += 1
            if self.probes == 1:
                raise RuntimeError("transient Py4J error")
            return self._df.storageLevel

        def __getattr__(self, name):
            return getattr(self._df, name)

    release_guard_caches(blocking=True)
    real = _guard_cache(spark.range(5).selectExpr("id AS k"))
    real.count()
    flaky = _FlakyProbe(real)
    _GUARD_CACHES[:] = [flaky]
    _prune_released_guard_caches()  # probe raises, session is live -> kept
    assert _GUARD_CACHES == [flaky], "transient probe failure dropped a live cache"
    _prune_released_guard_caches()  # second probe succeeds, still persisted
    assert _GUARD_CACHES == [flaky]

    class _DeadHandle:
        """Every attribute walk raises — the torn-down-gateway shape."""

        @property
        def storageLevel(self):
            raise RuntimeError("dead JVM handle")

        @property
        def sparkSession(self):
            raise RuntimeError("dead JVM handle")

    _GUARD_CACHES.append(_DeadHandle())
    _prune_released_guard_caches()  # dead handle drops; live entry stays
    assert _GUARD_CACHES == [flaky]
    _GUARD_CACHES[:] = [real]
    assert release_guard_caches(blocking=True) == 1


def test_broadcast_guarded_rejects_bc_mass_column(spark):
    """The mass scalar rides in under the fixed name `_bc_mass`; an input
    frame already carrying that column must fail loudly at construction,
    not silently collide inside the plan."""
    import pytest
    from pyspark.sql import functions as F

    from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
        _broadcast_guarded,
    )

    df = spark.range(3).select(
        F.col("id").alias("doc_a"), F.lit(1).alias("_bc_mass")
    )
    with pytest.raises(ValueError, match="_bc_mass"):
        _broadcast_guarded(df, "collision-pin")
