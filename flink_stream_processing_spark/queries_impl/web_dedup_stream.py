"""Streaming canonical-URL dedup + cross-document duplicate spans (LLM
extension, r11):

- ``streaming_url_dedup``: the 24/7 form of ``url_normalize_dedup``
  (retrieval2.py) — a documents file stream is canonicalized with the
  SAME JVM expression chain (imported, not re-derived) and deduped in
  flight with ``dropDuplicatesWithinWatermark`` on the canonical key.
  Composes two proven parts: the r10 URL normalizer (oracle-green) and
  the watermark-bounded streaming dedup state machine
  (``streaming_dedup_within_watermark``, windows_extra.py). Event time
  is a deterministic synthetic timestamp (epoch + doc_id seconds — the
  corpus has no crawl-time column); the watermark horizon (365 days) is
  wider than the corpus' synthetic time span, so no row can be dropped
  as late and the append-mode output equals the batch DISTINCT oracle.
  An unbounded deployment picks the horizon as its dedup-guarantee
  window and trades re-emission beyond it for bounded state.

- ``cross_doc_duplicate_spans``: the span-level generalization of
  ``duplicate_ngram_spans`` (llm_dedup.py) past its fixed window — the
  suffix-array-style MAXIMAL shared token runs between document PAIRS
  ("Deduplicating Training Data Makes Language Models Better": their
  suffix-array duplicate spans, realized relationally). Two windows at
  the same (doc_a, doc_b) diagonal offset within W of each other force
  the whole interval to match, so matched windows on one diagonal form
  contiguous runs; merging each run yields the maximal span exactly —
  (doc_a, doc_b, start_a, start_b, len_tokens), len >= W.

Scale design (100 TB):
- streaming_url_dedup: the canonicalization is one whole-stage-codegen
  projection per micro-batch (zero Python lane); dedup state is one
  entry per canonical key within the watermark horizon, hash-partitioned
  on the full canonical URL (hosts shard naturally), and RocksDB-backed
  state + changelog checkpointing (proven on this repo's streaming
  stress rung) bounds executor memory.
- cross_doc_duplicate_spans: window hashes build doc-locally (narrow
  O(total tokens) rows; text never shuffles); ONE groupBy shuffle on
  the window hash buckets them, and matched pairs are generated
  IN-ARRAY inside each bucket (the lsh_candidate_pairs idiom — a
  self-join would evaluate the whole window-hash pipeline twice, since
  the build side cannot reuse the probe side's exchange), guarded by
  the LOUD hot-bucket assert (a boilerplate hash with thousands of
  occurrences means upstream exact-dedup is owed, and silently
  exploding O(cnt²) would hide it); the diagonal island merge is one
  further shuffle on (doc_a, doc_b). sf0.1: 8.7k pairs from 178k
  windows. Never all-pairs, never O(corpus²).

r12 additions (see each query's docstring): ``streaming_crawl_pipeline``
(the dedup and window operators CHAINED — two stateful operators in one
streaming query), ``strip_duplicate_spans`` / ``strip_spans`` (the
keep-one-copy excision payload), ``span_coverage_profile`` (W=10/20/40
duplication profile in one scan), ``streaming_host_sessions`` (per-host
crawl session windows), and ``url_frontier_topk`` (per-host frontier
ranking).

No reference twin (the Flink app has no corpus operators; LLM extension
scope per SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

from ..operators.dedup import token_window_hashes
from ..operators.parallelism import spread_fanout
from ..operators.text import tokens_col

# Single-source family constants (synthetic event-time epoch, watermark
# horizon, span window, session gap, politeness pacing, frontier-rank
# CTEs, the incremental-strip oracle) live in the dependency-free
# ._span_shared leaf so the registered recrawl/store_maintenance modules
# can interpolate them into their module-level oracles even while THIS
# module is mid-import (the r15 registration's circular-import shape —
# see _span_shared's docstring). Re-exported here so existing
# `from .web_dedup_stream import X` sites and tests keep working; this
# import MUST precede `from ..queries import query` (the cycle's pause
# point) so the re-exports are bound on the partial module.
from ._span_shared import (  # noqa: F401  (re-exports)
    _EVENT_EPOCH,
    _FRONTIER_RANK_CTES,
    _HORIZON,
    _HORIZON_S,
    _HOST_SESSION_GAP_S,
    _INCR_STRIP_ORACLE,
    _POLITENESS_QUOTA,
    _POLITENESS_WINDOW_MS,
    _SPAN_W,
)
from ..queries import query
from ..sources.batch import load_table
from ._stream_helpers import _run_stream_to_table, _stream_session, table_stream_dir
from ._shared_exprs import (
    URL_CANON_CTES as _URL_CANON_CTES,
    canonical_url_col,
    derived_url_col,
)


def _event_ts():
    return F.when(
        F.assert_true(
            F.col("doc_id") < _HORIZON_S,
            F.concat(
                F.lit(
                    "web_dedup_stream: doc_id seconds exceed the watermark "
                    "horizon — late drops would desynchronize the streaming "
                    "dedups from their batch oracles; widen the horizon or "
                    "rescale the synthetic event time. doc_id="
                ),
                F.col("doc_id").cast("string"),
            ),
        ).isNull(),
        F.timestamp_seconds(F.lit(_EVENT_EPOCH) + F.col("doc_id")),
    )


def _documents_stream_dir(sf_dir: str) -> str:
    return table_stream_dir(sf_dir, "documents")


_DOCUMENTS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """The ``documents`` table as a file stream (test stand-in for a crawl
    feed). Explicit schema — a streaming source must never pay an
    inference pass, and the driver's parquet layout is pinned."""
    return spark.readStream.schema(_DOCUMENTS_STREAM_SCHEMA).parquet(path)


_STREAM_URL_DEDUP_ORACLE = f"""
WITH {_URL_CANON_CTES}
SELECT DISTINCT canonical_url FROM canon ORDER BY canonical_url
"""


@query("streaming_url_dedup", oracle=_STREAM_URL_DEDUP_ORACLE)
def q_streaming_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight crawl dedup: canonicalize each document's URL (the r10
    normalizer, imported) and emit each canonical URL once, on first
    sight, with state bounded to the watermark horizon
    (dropDuplicatesWithinWatermark). Output is the key alone — WHICH
    variant arrives first is a race in any parallel source, so a
    deterministic gate can only assert the key set, which equals the
    batch DISTINCT oracle because the horizon out-spans the corpus."""
    stream = documents_file_stream(
        _stream_session(spark), _documents_stream_dir(sf_dir)
    )
    # Synthetic deterministic event time: the corpus has no crawl-time
    # column; epoch + doc_id seconds spans ~14 h at sf0.1 — far inside
    # the 365-day horizon, so the no-late-drop precondition holds at
    # every test SF.
    canon = stream.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _event_ts().alias("ts"),
    )
    deduped = (
        canon.withWatermark("ts", _HORIZON)
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .select("canonical_url")
    )
    # orderBy matches the oracle's ORDER BY (module convention shared with
    # windows_extra's streaming queries; the gate itself is order-insensitive)
    return _run_stream_to_table(deduped, "append").orderBy("canonical_url")


# _SPAN_W (the seed n-gram window length) is imported from ._span_shared.
# Loud-fail ceiling on per-hash multiplicity (max observed at sf0.1: 4).
# Tighter than dedup.py's MAX_BUCKET_SIZE (10k): that expansion carries
# id-only arrays, this one 4-field (doc_a, doc_b, sa, sb) structs, so the
# O(cnt^2) blow-up reaches the multi-GB single-row range around ~5k
# members — the guard must fire FIRST to serve its purpose. 1k members
# = ~500k pair structs = tens of MB, still 250x observed headroom.
_SPAN_MAX_MULT = 1_000

# Loud-fail ceiling on the TOTAL INTERVAL/SPAN mass of a span-side frame
# that a query below force-broadcasts (r12 verdict: the one remaining
# unguarded 100x-scale assumption). `_SPAN_MAX_MULT` bounds per-hash
# fan-out, not duplication MASS: on a heavily-duplicated crawl the span /
# interval frame is a corpus-fraction-sized relation, and a forced
# broadcast of it kills the driver long after every per-bucket guard
# passed. The budgeted unit is one flat span/interval struct (~5 8-byte
# fields, ~40 B data, ~10x that as driver-side JVM objects) — NOT the
# post-aggregation per-doc row count, which a review found can hide
# thousands of intervals per doc under _SPAN_MAX_MULT; 2M structs keeps
# the collected relation in the low-hundreds-of-MB — comfortable on any
# real driver, ~10 000x the 221 observed at sf0.1. Over budget, the named
# assert below fires with the fallback spelled out instead of an opaque
# driver OOM.
_SPAN_BROADCAST_BUDGET = 2_000_000

# Release contract for the guard caches (r13 advice): the span queries
# .cache() an intermediate so the guard's mass aggregate and the
# broadcast share one evaluation of the span lineage. bench.py scopes
# and unpersists those blocks per query, but a LIBRARY caller composing
# these functions has no such machinery — every cached frame is
# registered here and released by release_guard_caches(), which callers
# invoke once their returned DataFrame has been fully consumed (the
# cache must outlive the action that populates and reads it; releasing
# earlier would just silently recompute the lineage twice).
_GUARD_CACHES: list[DataFrame] = []


def _session_is_dead(df: DataFrame) -> bool:
    """True when the frame's session/JVM handle is genuinely gone (a
    stopped SparkSession nulls its context's _jsc; a torn-down gateway
    makes even the attribute walk raise). Only THIS state licenses
    dropping a guard-cache entry unseen — anything else might still be a
    persisted block."""
    try:
        return df.sparkSession._sc._jsc is None
    except Exception:
        return True


def _prune_released_guard_caches() -> None:
    """Drop entries that are no longer persisted (r15 advice): bench.py
    and the driver unpersist guard blocks through their own RDD-level
    scoping and never call release_guard_caches(), so without pruning the
    registry grows one dead reference per guarded query for the life of
    the process — and a later release_guard_caches() would double-
    unpersist them. A block someone else released reports the default
    (non-persisted) storage level; keep only live ones. A storageLevel
    probe that raises on a LIVE session (transient Py4J hiccup) keeps
    its entry (r16 advice): dropping it would let a still-persisted
    block escape release_guard_caches() for the process lifetime —
    the next prune or release retries it instead."""
    alive = []
    for df in _GUARD_CACHES:
        try:
            lvl = df.storageLevel
        except Exception:
            if not _session_is_dead(df):
                alive.append(df)  # transient probe failure: keep, retry later
            continue
        if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
            alive.append(df)
    _GUARD_CACHES[:] = alive


def _guard_cache(df: DataFrame) -> DataFrame:
    """``.cache()`` + registration in the module release list — every
    guard-cache site goes through here so release_guard_caches() can
    restore the session's persistent-RDD set (test-pinned: a bare-session
    sweep of the span queries plus a release leaves no net new blocks).
    Registration first prunes entries already unpersisted by external
    machinery (bench.py's per-query RDD scoping), bounding the list at
    the live-cache count instead of the process-lifetime query count."""
    _prune_released_guard_caches()
    _GUARD_CACHES.append(df.cache())
    return df


def release_guard_caches(blocking: bool = False) -> int:
    """Unpersist every guard cache created since the last call; returns
    how many were released. Safe to call with queries in flight ONLY if
    their actions are done — unpersisting a cache mid-action falls back
    to lineage recomputation (correct, slower)."""
    n = 0
    while _GUARD_CACHES:
        df = _GUARD_CACHES.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # a stopped session has nothing left to release
    return n


def _broadcast_guarded(
    df: DataFrame,
    pin: str,
    budget: int = _SPAN_BROADCAST_BUDGET,
    mass=None,
) -> DataFrame:
    """Broadcast hint with an in-plan loud size guard — the hot-bucket
    idiom applied to TOTAL broadcast mass. ``mass`` is the aggregate
    Column measuring that mass (default: row count — right for flat span
    frames; callers broadcasting per-doc ARRAY aggregates must pass the
    element-mass aggregate, e.g. ``F.sum(F.size(...))``, or one doc with
    thousands of intervals hides under a row count). The mass aggregates
    tree-like (map-side partials; one output row regardless of input
    size), rides a broadcast scalar cross join back into the frame (the
    documented single-row stats idiom — bm25/cms precedent), and is woven
    into the frame's FIRST column (always a consumed join key at the call
    sites) via ``assert_true`` so the optimizer cannot prune the check.

    The input must already be PERSISTED (``_guard_cache`` at the call
    sites — which also registers the block for ``release_guard_caches``)
    when its lineage is expensive: the mass aggregate and the broadcast
    are two consumers of ``df``, and without persistence Spark evaluates
    the whole lineage twice (no cross-subtree exchange reuse — measured
    +22 to +36% on the span queries before the cache landed). cache, not
    localCheckpoint: a checkpoint compiles to RDDs at CONSTRUCTION time,
    which under AQE executes the shuffle stages eagerly — plan-only
    callers would pay full execution — while a cache is populated by the
    guard's own first consumer (bench.py's release machinery unpersists
    per-query blocks; library callers use ``release_guard_caches``). Under budget the plan is the original
    broadcast plus one scalar ride-in; over budget the job fails NAMED
    before the driver collects the relation — though AFTER the lineage
    computes once to count it (a corpus-fraction-sized frame is built
    and cached, then rejected; late but loud, and strictly cheaper than
    the OOM it replaces)."""
    # The scalar rides in under a fixed name and is woven into the first
    # column — both are CONTRACT, not convention (r13 advice): a caller
    # whose frame already carries a `_bc_mass` column would collide with
    # the ride-in, and one whose first column the downstream join prunes
    # would let the optimizer drop the assert with it. Fail loudly here;
    # every current call site passes a join-key-first span frame.
    if "_bc_mass" in df.columns:
        raise ValueError(
            f"_broadcast_guarded({pin}): input already has a '_bc_mass' "
            "column — rename it; the guard weaves its mass scalar in "
            "under that name"
        )
    agg = (F.count(F.lit(1)) if mass is None else mass).alias("_bc_mass")
    cnt = df.groupBy().agg(agg)
    first = df.columns[0]
    guarded = (
        df.crossJoin(F.broadcast(cnt))
        .withColumn(
            first,
            F.when(
                F.assert_true(
                    F.col("_bc_mass") <= budget,
                    F.concat(
                        F.lit(f"{pin}: span-frame broadcast budget exceeded: mass="),
                        F.col("_bc_mass").cast("string"),
                        F.lit(
                            f" > {budget} — duplication mass is"
                            " corpus-fraction-sized; drop the broadcast hint"
                            " (AQE picks a shuffle join on the doc id) or run"
                            " exact dedup upstream"
                        ),
                    ),
                ).isNull(),
                F.col(first),
            ),
        )
        .drop("_bc_mass")
    )
    return F.broadcast(guarded)

# The full span reconstruction as a CTE chain (window hashes -> global
# multiplicity -> cross-doc matches -> diagonal islands -> maximal spans),
# composed by BOTH the span oracle and the span-text oracle below so the
# two gates share one construction.
_CROSS_SPAN_CTES = rf"""t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
),
b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
w AS (
  SELECT doc_id, unnest(range(0, greatest(n_tokens - {_SPAN_W} + 1, 0))) AS s, toks
  FROM b
),
h AS (
  SELECT doc_id, s, md5(array_to_string(toks[s+1:s+{_SPAN_W}], ' ')) AS h FROM w
),
c AS (SELECT doc_id, s, h, count(*) OVER (PARTITION BY h) AS cnt FROM h),
d AS (SELECT doc_id, s, h FROM c WHERE cnt >= 2),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
  FROM d a JOIN d b USING (h)
  WHERE a.doc_id < b.doc_id
),
i1 AS (
  SELECT doc_a, doc_b, sa, sb,
         CASE WHEN lag(sa) OVER win IS NULL OR sa - lag(sa) OVER win > 1
              THEN 1 ELSE 0 END AS new_run
  FROM p WINDOW win AS (PARTITION BY doc_a, doc_b, sa - sb ORDER BY sa)
),
i2 AS (
  SELECT doc_a, doc_b, sa, sb,
         sum(new_run) OVER (PARTITION BY doc_a, doc_b, sa - sb ORDER BY sa
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM i1
),
spans AS (
  SELECT doc_a, doc_b, min(sa) AS start_a, min(sb) AS start_b,
         CAST(max(sa) - min(sa) + {_SPAN_W} AS BIGINT) AS len_tokens
  FROM i2 GROUP BY doc_a, doc_b, sa - sb, run_id
)"""

_CROSS_SPAN_ORACLE = f"""
WITH {_CROSS_SPAN_CTES}
SELECT doc_a, doc_b, start_a, start_b, len_tokens
FROM spans
ORDER BY len_tokens DESC, doc_a, doc_b, start_a, start_b
"""


# Pairs within one window-hash bucket, generated INSIDE the collected
# array (same shape as operators/dedup._BUCKET_PAIR_EXPR, carrying both
# start offsets): cross-document only (doc_a < doc_b).
_SPAN_PAIR_EXPR = """
flatten(transform(ds, x ->
  filter(transform(ds, y -> IF(x.doc_id < y.doc_id,
           struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
                  x.s AS sa, y.s AS sb), null)),
         z -> z IS NOT NULL)))
"""


def _tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, n_tokens) via ``text.tokens_col`` — the one
    tokenization convention shared by every token surface and oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.col("doc_id"), tokens_col().alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )


def _span_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered maximal-span frame over the documents table — the Spark
    twin of the ``spans`` CTE, shared by the span and span-text queries."""
    return maximal_shared_spans(_tokenized_docs(spark, sf_dir))


def maximal_shared_spans(
    base: DataFrame, max_mult: int = _SPAN_MAX_MULT
) -> DataFrame:
    """Maximal cross-document shared token runs over a
    (doc_id, toks, n_tokens) frame: (doc_a, doc_b, start_a, start_b,
    len_tokens), unordered. Exposed on the tokenized frame (not the
    table path) so the opt-in planted-span scale rung and the guard
    tests can drive the same operator over synthetic corpora. Plan
    shape documented on ``q_cross_doc_duplicate_spans``.

    Window hashing is ``dedup.token_window_hashes`` — ONE construction
    shared with ``duplicate_ngram_spans`` (per-doc coverage there,
    cross-doc span pairs here; the r11-queued extraction, paid r12)."""
    wins = token_window_hashes(base, _SPAN_W)

    # One groupBy shuffle on the hash; buckets of size 1 drop before the
    # pair expansion. Loud-fail hot-hash guard (LSH hot-bucket idiom): a
    # window hash with huge multiplicity means O(cnt²) in-array pair
    # expansion — that corpus owes an upstream exact-dedup pass, and
    # failing beats an opaque OOM. Woven into the exploded column so the
    # optimizer cannot prune it.
    buckets = (
        wins.groupBy("h")
        .agg(F.collect_list(F.struct("doc_id", "s")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    guarded = buckets.withColumn(
        "ds",
        F.when(
            F.assert_true(
                F.size("ds") <= max_mult,
                F.concat(
                    F.lit(
                        "cross_doc_duplicate_spans: window-hash multiplicity over "
                    ),
                    F.lit(str(max_mult)),
                    F.lit(": cnt="),
                    F.size("ds").cast("string"),
                    F.lit(" — run exact dedup upstream or raise _SPAN_MAX_MULT"),
                ),
            ).isNull(),
            F.col("ds"),
        ),
    )
    pairs = guarded.select(
        F.explode(F.expr(_SPAN_PAIR_EXPR)).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.sa", "p.sb")

    diag = Window.partitionBy("doc_a", "doc_b", F.col("sa") - F.col("sb"))
    run_win = diag.orderBy("sa")
    marked = pairs.withColumn(
        "new_run",
        F.when(
            F.lag("sa").over(run_win).isNull()
            | ((F.col("sa") - F.lag("sa").over(run_win)) > 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("new_run").over(run_win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy("doc_a", "doc_b", (F.col("sa") - F.col("sb")).alias("d"), "run_id")
        .agg(
            F.min("sa").alias("start_a"),
            F.min("sb").alias("start_b"),
            (F.max("sa") - F.min("sa") + _SPAN_W).cast("long").alias("len_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "len_tokens")
    )


@query("cross_doc_duplicate_spans", oracle=_CROSS_SPAN_ORACLE)
def q_cross_doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal shared token spans between document pairs: hash every
    W-token window (doc-locally, text never shuffled), bucket by window
    hash in ONE groupBy shuffle, generate cross-document matches in-array
    inside each bucket (a self-join would run the whole window-hash
    pipeline twice; this is the lsh_candidate_pairs shape, with a loud
    hot-bucket guard), and merge contiguous matches per
    (doc_a, doc_b, diagonal) into maximal spans with the classic
    lag/running-sum island pass. Exactness: two same-diagonal window
    matches within W of each other force the whole covering interval
    equal, so runs are contiguous and the merged interval is the maximal
    shared span (md5 collisions could only ever ADD a window; none exist
    on these corpora and any would have to align on a diagonal run to
    alter a span)."""
    return _span_frame(spark, sf_dir).orderBy(
        F.col("len_tokens").desc(), "doc_a", "doc_b", "start_a", "start_b"
    )


_SPAN_TEXT_ORACLE = f"""
WITH {_CROSS_SPAN_CTES}
SELECT s.doc_a, s.doc_b, s.start_a, s.len_tokens,
       array_to_string(t.toks[s.start_a + 1 : s.start_a + s.len_tokens], ' ')
         AS span_text
FROM spans s JOIN t ON t.doc_id = s.doc_a
ORDER BY s.len_tokens DESC, s.doc_a, s.doc_b, s.start_a, s.start_b
"""


@query("duplicate_span_texts", oracle=_SPAN_TEXT_ORACLE)
def q_duplicate_span_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strip/down-weight payload: each maximal cross-document span
    joined back to doc_a's tokens to surface the duplicated text itself
    (what a pipeline would excise or down-weight). The span frame is tiny
    (sf0.1: 221 rows) and BROADCASTS into one narrow join against the
    token projection — surfacing the text adds zero wide operations on
    top of the span plan. The broadcast is size-GUARDED
    (``_broadcast_guarded``): span count scales with the corpus'
    duplication mass, so a heavily-duplicated crawl fails the named
    budget assert instead of OOMing the driver. The span frame is
    cached first — the guard's mass aggregate and the broadcast are two
    consumers, and without persistence the whole span pipeline would
    execute twice (measured +36% at sf0.1; cache not checkpoint, so
    construction stays lazy — see _broadcast_guarded)."""
    spans = _guard_cache(_span_frame(spark, sf_dir))
    toks = _tokenized_docs(spark, sf_dir).select(
        F.col("doc_id").alias("doc_a"), "toks"
    )
    return (
        toks.join(_broadcast_guarded(spans, "duplicate_span_texts"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            "len_tokens",
            F.concat_ws(
                " ",
                F.slice(
                    "toks", F.col("start_a").cast("int") + 1,
                    F.col("len_tokens").cast("int"),
                ),
            ).alias("span_text"),
        )
        .orderBy(F.col("len_tokens").desc(), "doc_a", "doc_b", "start_a")
    )


_CONTENT_FP_ORACLE = r"""
SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
  AS content_fp
FROM documents ORDER BY content_fp
"""


@query("streaming_content_dedup", oracle=_CONTENT_FP_ORACLE)
def q_streaming_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of crawl dedup: content-FINGERPRINT dedup in flight
    (md5 of whitespace-collapsed lowercased text — ``text.fingerprint``'s
    ``fp_md5`` key; DELIBERATELY not the exact_dedup family's
    whitespace-preserving key — see dedup.py's NORMALIZATION CONTRACT:
    the two are different keys and a store built with one must never be
    probed with the other), same watermark-bounded state machine as
    ``streaming_url_dedup``. A page served under two URLs dedups here;
    two pages under one URL dedup there — production crawls run both."""
    stream = documents_file_stream(
        _stream_session(spark), _documents_stream_dir(sf_dir)
    )
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    keyed = stream.select(
        fp.alias("content_fp"),
        _event_ts().alias("ts"),
    )
    deduped = (
        keyed.withWatermark("ts", _HORIZON)
        .dropDuplicatesWithinWatermark(["content_fp"])
        .select("content_fp")
    )
    return _run_stream_to_table(deduped, "append").orderBy("content_fp")


_HOT_HOSTS_ORACLE = f"""
WITH {_URL_CANON_CTES},
tc AS (
  SELECT make_timestamp(({_EVENT_EPOCH} + doc_id) * 1000000) AS ts,
         regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host
  FROM canon
)
SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTES, ts)) AS window_start,
       host, CAST(count(*) AS BIGINT) AS n_docs
FROM tc GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("streaming_hot_hosts", oracle=_HOT_HOSTS_ORACLE)
def q_streaming_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-host monitoring: per-host crawl volume in 10-minute tumbling
    event-time windows over the streaming canonical-URL projection — the
    signal a crawler's politeness/skew controller consumes. Complete-mode
    windowed count through the real streaming path, hash-checked against
    the batch time_bucket oracle. Boundary agreement: Spark tumbling
    windows align to the Unix epoch; DuckDB time_bucket aligns to its
    2000-01-01 origin — the two coincide exactly when the bucket width
    divides the 946 684 800 s offset between the origins, which 600 s
    does (and any width that doesn't would hash-mismatch loudly in the
    driver gate, not silently drift)."""
    stream = documents_file_stream(
        _stream_session(spark), _documents_stream_dir(sf_dir)
    )
    canon = stream.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _event_ts().alias("ts"),
    )
    hosts = canon.select(
        F.regexp_extract("canonical_url", r"^https://([^/?]+)", 1).alias("host"),
        "ts",
    )
    agg = (
        hosts.groupBy(F.window("ts", "10 minutes"), "host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start"),
            "host",
            "n_docs",
        )
    )
    return _run_stream_to_table(agg, "complete").orderBy("window_start", "host")


# ---------------------------------------------------------------------------
# r12 adds: the crawl operators COMPOSED (chained stateful streaming), the
# strip payload (the downstream half of duplicate_span_texts), a variable-
# window span profile, per-host crawl sessions, and the frontier ranker.

# Deterministic per-URL schedule time for the composed pipeline: WHICH
# messy variant wins the dedup race is nondeterministic in any parallel
# source, so downstream stages may only depend on the canonical KEY. The
# repo's cross-engine seeded-hash recipe (Spark conv(md5[:8], 16, 10) ==
# DuckDB ('0x' || substr(md5, 1, 8))::BIGINT) spreads each URL over a
# one-day schedule window.
_SCHED_SPAN_S = 86_400


def _sched_ts(url_col):
    h = F.conv(F.substring(F.md5(url_col), 1, 8), 16, 10).cast("long")
    return F.timestamp_seconds(F.lit(_EVENT_EPOCH) + h % _SCHED_SPAN_S)


_CRAWL_PIPELINE_ORACLE = f"""
WITH {_URL_CANON_CTES},
u AS (SELECT DISTINCT canonical_url FROM canon),
tc AS (
  SELECT make_timestamp(({_EVENT_EPOCH}
           + (('0x' || substr(md5(canonical_url), 1, 8))::BIGINT % {_SCHED_SPAN_S}))
           * 1000000) AS ts,
         regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host
  FROM u
),
mx AS (SELECT max(ts) AS max_ts FROM tc)
SELECT epoch_ms(time_bucket(INTERVAL 10 MINUTES, ts)) AS window_start, host,
       CAST(count(*) AS BIGINT) AS n_urls
FROM tc, mx
WHERE time_bucket(INTERVAL 10 MINUTES, ts) + INTERVAL 10 MINUTES
        <= max_ts - INTERVAL 10 MINUTES
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("streaming_crawl_pipeline", oracle=_CRAWL_PIPELINE_ORACLE)
def q_streaming_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl operators COMPOSED in ONE streaming query — two chained
    stateful operators (canonical-URL dedup -> per-host windowed distinct-
    URL counts) under a single watermark, proving the r11 parts compose
    rather than merely run side by side. Append mode: the availableNow
    run's trailing no-data batch advances the watermark to max_ts - delay
    and flushes every closed window (the chained-agg idiom;
    windows_extra.q_streaming_chained_agg pins the <= boundary).

    Determinism: which messy URL variant survives the dedup race is
    arbitrary, so every downstream column derives from the canonical KEY
    alone — host by regexp, event time by the seeded-md5 schedule hash
    (both engines compute the identical value; see _sched_ts).

    PRECONDITION (r12 review): the schedule span (1 day) is WIDER than
    the dedup horizon (10 min) — the opposite of the 365-day queries —
    so oracle equality additionally requires the finite fixture to
    arrive in ONE micro-batch (no inter-batch watermark advance, hence
    no late drops or state evictions mid-corpus). The harness
    guarantees it structurally: each stream dir holds exactly one
    parquet FILE (table_stream_dir symlinks the single fixture file; a
    file source cannot split one file across batches) and no
    maxFilesPerTrigger is set. Pinned by
    test_crawl_pipeline_single_batch_precondition; an unbounded
    deployment instead picks a horizon >= its reordering bound, like
    any watermark choice.

    Scale: state = one dedup entry per canonical key within the horizon
    plus one open-window pane per (window, host); both watermark-bounded,
    RocksDB-backed. The politeness controller reads the output as its
    per-host discovery-rate signal."""
    stream = documents_file_stream(
        _stream_session(spark), _documents_stream_dir(sf_dir)
    )
    canon = (
        stream.select(canonical_url_col(derived_url_col()).alias("canonical_url"))
        .withColumn("ts", _sched_ts(F.col("canonical_url")))
        .withColumn(
            "host", F.regexp_extract("canonical_url", r"^https://([^/?]+)", 1)
        )
    )
    deduped = canon.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["canonical_url"]
    )
    agg = (
        deduped.groupBy(F.window("ts", "10 minutes"), "host")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start"),
            "host",
            "n_urls",
        )
    )
    return _run_stream_to_table(agg, "append").orderBy("window_start", "host")


_STRIP_SPANS_ORACLE = f"""
WITH {_CROSS_SPAN_CTES},
iv AS (SELECT doc_b AS doc_id, start_b AS st, start_b + len_tokens AS en FROM spans),
aff AS (SELECT DISTINCT doc_id FROM iv),
poss AS (
  SELECT t.doc_id, u.i AS pos, t.toks[CAST(u.i AS INTEGER) + 1] AS tok
  FROM t JOIN aff USING (doc_id), UNNEST(range(0, len(t.toks))) AS u(i)
),
p2 AS (
  SELECT poss.*,
         EXISTS (SELECT 1 FROM iv
                 WHERE iv.doc_id = poss.doc_id
                   AND poss.pos >= iv.st AND poss.pos < iv.en) AS cov
  FROM poss
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS removed_tokens,
       coalesce(string_agg(CASE WHEN NOT cov THEN tok END, ' ' ORDER BY pos), '')
         AS clean_text
FROM p2 GROUP BY doc_id ORDER BY doc_id
"""


@query("strip_duplicate_spans", oracle=_STRIP_SPANS_ORACLE)
def q_strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level STRIP — the downstream half of ``duplicate_span_texts``
    ("Deduplicating Training Data" §4: keep one copy, excise the rest):
    every document appearing as doc_b in a maximal cross-doc span is
    rewritten with the covered token positions removed (doc_a — the lower
    id — keeps its copy). Output is the AFFECTED docs only: (doc_id,
    n_tokens, removed_tokens, clean_text).

    Plan: the span frame is tiny (sf0.1: 221 rows) — its per-doc interval
    lists aggregate narrowly and BROADCAST (size-guarded, see
    ``_broadcast_guarded``) into the token projection; the
    excision itself is one in-array filter (positions covered by any
    interval) inside whole-stage codegen, no extra wide op beyond the
    span plan. No interval merging is needed: `exists` over raw intervals
    is coverage-equivalent and removed_tokens falls out as
    n_tokens - size(kept)."""
    return strip_spans(
        _tokenized_docs(spark, sf_dir), _span_frame(spark, sf_dir)
    ).orderBy("doc_id")


def strip_spans(
    base: DataFrame,
    spans: DataFrame,
    broadcast_budget: int = _SPAN_BROADCAST_BUDGET,
) -> DataFrame:
    """Excise every doc_b-side span from a (doc_id, toks, n_tokens) frame:
    the operator behind ``strip_duplicate_spans``, exposed on frames so the
    opt-in planted-span scale rung drives the same construction over
    synthetic corpora (the ``maximal_shared_spans`` convention). Unordered
    output: (doc_id, n_tokens, removed_tokens, clean_text) for the
    affected docs only. The interval-frame broadcast is size-guarded
    (``_broadcast_guarded``; ``broadcast_budget`` exposed so the guard
    test can trip it on a small fixture). The guarded MASS is the total
    interval count — ``sum(size(ivs))``, not the per-doc row count, which
    would hide thousands of intervals per doc under ``_SPAN_MAX_MULT`` —
    and the aggregated frame is cached so the mass aggregate and the
    broadcast share one evaluation of the span lineage (cache not
    checkpoint: construction stays lazy, see ``_broadcast_guarded``)."""
    ivs = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.struct(
                F.col("start_b").alias("st"),
                (F.col("start_b") + F.col("len_tokens")).alias("en"),
            ).alias("iv"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list("iv").alias("ivs"))
    )
    ivs = _guard_cache(ivs)
    return _excise_covered_positions(
        base,
        _broadcast_guarded(
            ivs,
            "strip_duplicate_spans",
            broadcast_budget,
            mass=F.sum(F.size("ivs")),
        ),
    )


def _excise_covered_positions(base: DataFrame, ivs: DataFrame) -> DataFrame:
    """The excision tail shared by ``strip_spans`` (broadcast-guarded
    corpus-span path) and ``incremental_strip_new_docs`` (batch-scaled
    interval frame; plain doc_id join, AQE picks the strategy): join a
    (doc_id, ivs: array<struct<st, en>>) interval frame into the token
    projection and drop every covered position with ONE in-array codegen
    filter. Overlapping intervals are fine — coverage is the exists-union
    and removed_tokens counts each position once."""
    kept = F.expr(
        """
        filter(transform(toks, (x, i) -> struct(x AS tok, i AS pos)),
               p -> NOT exists(ivs, iv -> p.pos >= iv.st AND p.pos < iv.en))
        """
    )
    return (
        base.join(ivs, "doc_id")
        .withColumn("kept", kept)
        .select(
            "doc_id",
            F.col("n_tokens"),
            (F.col("n_tokens") - F.size("kept")).cast("long").alias("removed_tokens"),
            F.concat_ws(" ", F.expr("transform(kept, p -> p.tok)")).alias(
                "clean_text"
            ),
        )
    )


_SPAN_PROFILE_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
),
b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
h AS (
  SELECT doc_id, ws.w AS w,
         md5(array_to_string(toks[CAST(u.s AS INTEGER) + 1
                                  : CAST(u.s AS INTEGER) + ws.w], ' ')) AS h
  FROM b,
       UNNEST([10, 20, 40]) AS ws(w),
       UNNEST(range(0, greatest(n_tokens - ws.w + 1, 0))) AS u(s)
),
c AS (SELECT doc_id, w, h, count(*) OVER (PARTITION BY w, h) AS cnt FROM h)
SELECT CAST(w AS BIGINT) AS window_w,
       CAST(count(*) AS BIGINT) AS total_windows,
       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
       CAST(count(DISTINCT CASE WHEN cnt >= 2 THEN h END) AS BIGINT) AS dup_hashes,
       CAST(count(DISTINCT CASE WHEN cnt >= 2 THEN doc_id END) AS BIGINT)
         AS docs_affected
FROM c GROUP BY w ORDER BY window_w
"""


@query("span_coverage_profile", oracle=_SPAN_PROFILE_ORACLE)
def q_span_coverage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-window profile at W = 10/20/40 in ONE corpus pass — the
    knob-tuning view for the span operators (how much duplication each
    window size would flag before committing to one). Windows for all
    three sizes are generated in a single nested in-array transform over
    each doc's tokens, then ONE analytic shuffle on (w, hash) counts
    multiplicities and one final 3-row aggregate folds the profile.

    Shape A/B (r12, sf0.1 local[32], identical results): a 3-scan UNION
    of token_window_hashes runs is WARM-FASTER here (2.1-2.3 s vs
    2.9-3.2 s — the 60k-row fixture scan is page-cached and nearly free,
    so the nested CASE/flatten's codegen overhead dominates). Single-scan
    is kept anyway: the profile's target regime is a petabyte text corpus
    where the scan IS the cost and 3x I/O loses by far more than 0.8 s of
    expression overhead — the plan pin (test_span_coverage_profile_single_scan)
    encodes that choice deliberately."""
    docs = load_table(spark, sf_dir, "documents")
    # All three window sizes' md5 hashing happens in the map stage below —
    # re-spread the 1-split scan so it runs on every core (no-op when wide).
    base = spread_fanout(
        docs.select(F.col("doc_id"), tokens_col().alias("toks"))
    ).withColumn("n_tokens", F.size("toks").cast("long"))
    wexpr = """
    flatten(transform(array(10, 20, 40), w ->
      CASE WHEN n_tokens >= w THEN
        transform(sequence(0, cast(n_tokens - w AS int)),
                  s -> struct(cast(w AS long) AS w,
                              md5(concat_ws(' ', slice(toks, s + 1, w))) AS h))
      ELSE cast(array() AS array<struct<w: long, h: string>>) END))
    """
    wins = base.select(
        "doc_id", F.explode(F.expr(wexpr)).alias("x")
    ).select("doc_id", F.col("x.w").alias("w"), F.col("x.h").alias("h"))
    counted = wins.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("w", "h"))
    )
    return (
        counted.groupBy(F.col("w").alias("window_w"))
        .agg(
            F.count(F.lit(1)).alias("total_windows"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_windows"),
            F.countDistinct(F.when(F.col("cnt") >= 2, F.col("h"))).alias(
                "dup_hashes"
            ),
            F.countDistinct(F.when(F.col("cnt") >= 2, F.col("doc_id"))).alias(
                "docs_affected"
            ),
        )
        .orderBy("window_w")
    )


_HOST_SESSIONS_ORACLE = f"""
WITH {_URL_CANON_CTES},
tc AS (
  SELECT make_timestamp(({_EVENT_EPOCH} + doc_id) * 1000000) AS ts,
         regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host
  FROM canon
),
o AS (
  SELECT host, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY host ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY host ORDER BY ts)
                   >= INTERVAL {_HOST_SESSION_GAP_S} SECONDS
              THEN 1 ELSE 0 END AS new_sess
  FROM tc
),
s AS (
  SELECT host, ts,
         sum(new_sess) OVER (PARTITION BY host ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
)
SELECT host,
       epoch_ms(min(ts)) AS session_start,
       epoch_ms(max(ts)) + {_HOST_SESSION_GAP_S * 1000} AS session_end,
       CAST(count(*) AS BIGINT) AS n_docs
FROM s
GROUP BY host, sess_id
ORDER BY host, session_start
"""


@query("streaming_host_sessions", oracle=_HOST_SESSIONS_ORACLE)
def q_streaming_host_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl SESSIONS through the real streaming path: bursts of
    fetches against one host separated by >= 15 s of quiet — the pacing
    signal a politeness controller alternates against (windows_extra's
    session machinery, applied to the crawl feed; event time here is the
    arrival clock epoch + doc_id, NOT the schedule hash, so sessions
    reflect actual feed order). Complete mode over the finite stream,
    hash-checked against the gaps-and-islands batch oracle."""
    stream = documents_file_stream(
        _stream_session(spark), _documents_stream_dir(sf_dir)
    )
    hosts = stream.select(
        F.regexp_extract(
            canonical_url_col(derived_url_col()), r"^https://([^/?]+)", 1
        ).alias("host"),
        _event_ts().alias("ts"),
    )
    agg = (
        hosts.withWatermark("ts", "5 seconds")
        .groupBy(
            F.session_window("ts", f"{_HOST_SESSION_GAP_S} seconds"), "host"
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "host",
            F.unix_millis(F.col("session_window.start")).alias("session_start"),
            F.unix_millis(F.col("session_window.end")).alias("session_end"),
            "n_docs",
        )
    )
    return _run_stream_to_table(agg, "complete").orderBy("host", "session_start")


# Ranked-frontier CTE chain shared by the frontier and politeness
# oracles (one construction — a priority/rank tweak edits exactly one
# Spark helper and one CTE string): u (distinct canonical URLs; assumes a
# `canon` CTE in scope) -> r (host + md5 priority) -> k (per-host rank).
# The rank <= 3 cap stays in each consumer's final SELECT.
_FRONTIER_ORACLE = f"""
WITH {_URL_CANON_CTES},
{_FRONTIER_RANK_CTES}
SELECT host, canonical_url, priority, rank FROM k
WHERE rank <= 3 ORDER BY host, rank
"""


def ranked_frontier(urls: DataFrame, k: int = 3) -> DataFrame:
    """The one frontier-ranking construction (Spark twin of
    ``_FRONTIER_RANK_CTES``), shared by ``url_frontier_topk`` and the
    politeness controller: a (canonical_url) frame (already deduped) ->
    (host, canonical_url, priority, rank) with rank <= k per host, by the
    deterministic seeded-md5 priority. Unordered output."""
    r = urls.select(
        F.regexp_extract("canonical_url", r"^https://([^/?]+)", 1).alias("host"),
        "canonical_url",
        F.conv(F.substring(F.md5("canonical_url"), 1, 8), 16, 10)
        .cast("long")
        .alias("priority"),
    )
    wr = Window.partitionBy("host").orderBy("priority", "canonical_url")
    return r.withColumn("rank", F.row_number().over(wr).cast("long")).filter(
        F.col("rank") <= k
    )


@query("url_frontier_topk", oracle=_FRONTIER_ORACLE)
def q_url_frontier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-frontier scheduler: the next <= 3 canonical URLs per host by a
    deterministic priority (the seeded-md5 hash as the crawl-priority
    proxy; a production frontier plugs in freshness/PageRank here). Plan:
    the canonical dedup's single hash aggregate, then ONE shuffle on host
    for the per-host rank — a top-k-per-group that never materializes
    more than k rows per host past the rank filter. Host count scales
    with the web, so the partition-by-host window has natural parallelism
    and no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url")
    ).distinct()
    return ranked_frontier(u).orderBy("host", "rank")


# ---------------------------------------------------------------------------
# r13 adds: the politeness controller (the crawl family's capstone — the
# hot-hosts volume signal JOINED to the frontier ranking) and the
# incremental span strip (the incremental_exact_dedup shape applied to
# passages: strip NEW docs against a persisted corpus window-hash store
# without re-touching the old corpus).

_POLITENESS_ORACLE = f"""
WITH {_URL_CANON_CTES},
tc AS (
  SELECT canonical_url,
         make_timestamp(({_EVENT_EPOCH} + doc_id) * 1000000) AS ts,
         regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host
  FROM canon
),
w AS (
  SELECT epoch_ms(time_bucket(INTERVAL {_POLITENESS_WINDOW_MS // 1000} SECONDS, ts))
           AS window_start,
         host, count(*) AS n_docs
  FROM tc GROUP BY 1, 2
),
hl AS (
  SELECT host, max(window_start) AS last_window_start,
         CAST(sum(n_docs) AS BIGINT) AS observed_docs
  FROM w GROUP BY host
),
{_FRONTIER_RANK_CTES}
SELECT k.host, k.canonical_url, k.priority, k.rank, hl.observed_docs,
       CAST(hl.last_window_start
            + {_POLITENESS_WINDOW_MS} * CAST(floor((k.rank + {_POLITENESS_QUOTA} - 1)
                                  / {_POLITENESS_QUOTA}) AS BIGINT) AS BIGINT)
         AS scheduled_start
FROM k JOIN hl ON k.host = hl.host
WHERE k.rank <= 3
ORDER BY k.host, k.rank
"""


@query("politeness_frontier_schedule", oracle=_POLITENESS_ORACLE)
def q_politeness_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness controller — the crawl family COMPOSED at the host
    level: the frontier's next <=3 URLs per host (url_frontier_topk's
    ranking) are paced against the host's observed crawl volume
    (streaming_hot_hosts' windowed counts, batch form), _POLITENESS_QUOTA
    fetches per host per 10-minute window. Each entry's scheduled_start =
    the host's LAST observed crawl window plus ceil(rank / quota) full
    windows — new fetches start after the host's busy period and drain
    quota-at-a-time, the textbook per-host rate limit. (The oracle
    interpolates the quota as a literal; both engines spell ceil as
    floor((rank + Q - 1) / Q) so the idiom cannot drift.)

    Plan (100 TB): the volume side aggregates to ONE row per (window,
    host) then one per host (partial aggregation map-side; never carries
    URLs), the frontier side is the rank<=3-per-host window — both sides
    end up keyed on host, so the final join is a host-keyed shuffle join
    of two already-narrow relations (host count scales with the web;
    neither side is driver-collected or force-broadcast — AQE picks the
    strategy). The ranking is ``ranked_frontier`` — the SAME construction
    behind url_frontier_topk, imported not re-derived."""
    docs = load_table(spark, sf_dir, "documents")
    canon = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _event_ts().alias("ts"),
    )
    host = F.regexp_extract("canonical_url", r"^https://([^/?]+)", 1).alias("host")
    wins = (
        canon.select(host, "ts")
        .groupBy(F.window("ts", f"{_POLITENESS_WINDOW_MS // 1000} seconds"), "host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start"),
            "host",
            "n_docs",
        )
    )
    host_load = wins.groupBy("host").agg(
        F.max("window_start").alias("last_window_start"),
        F.sum("n_docs").cast("long").alias("observed_docs"),
    )
    ranked = ranked_frontier(canon.select("canonical_url").distinct())
    return politeness_schedule(ranked, host_load).orderBy("host", "rank")


def politeness_schedule(
    ranked: DataFrame,
    host_load: DataFrame,
    quota: int = _POLITENESS_QUOTA,
    window_ms: int = _POLITENESS_WINDOW_MS,
) -> DataFrame:
    """The pacing join, exposed on frames (the ``maximal_shared_spans``
    convention — law tests and scale rungs drive the operator over
    synthetic inputs): a ranked frontier (host, canonical_url, priority,
    rank) joins the per-host load signal (host, last_window_start,
    observed_docs) host-keyed, and each entry is scheduled
    ceil(rank / quota) windows after the host's last observed window.
    QUOTA LAW (test-pinned): at most ``quota`` entries share any
    (host, scheduled_start), and every schedule lands strictly after the
    host's last observed window. Unordered output."""
    slot = F.floor((F.col("rank") + quota - 1) / F.lit(quota)).cast("long")
    return ranked.join(host_load, "host").select(
        "host",
        "canonical_url",
        "priority",
        "rank",
        "observed_docs",
        (F.col("last_window_start") + F.lit(window_ms) * slot)
        .cast("long")
        .alias("scheduled_start"),
    )


def span_hash_store(corpus: DataFrame, window: int = _SPAN_W) -> DataFrame:
    """The persisted side of ``incremental_strip_new_docs``: the DISTINCT
    W-token window hashes of the existing corpus — at 100 TB a bucketed
    parquet/Delta table keyed on the hash, written once and appended per
    ingest batch (the ``exact_fingerprint_store`` convention, one level
    below whole-document granularity). Input is a tokenized
    (doc_id, toks, n_tokens) frame; output is a single-column (h) set."""
    return token_window_hashes(corpus, window).select("h").distinct()


def incremental_strip_new_docs(
    new_batch: DataFrame, store: DataFrame, window: int = _SPAN_W
) -> DataFrame:
    """Strip a NEW batch against the persisted span store WITHOUT
    re-touching the old corpus — the ``incremental_exact_dedup`` shape at
    passage granularity ("Deduplicating Training Data" §4 as a daily
    operation): every W-token window of a new doc whose hash already
    exists in the corpus store is a duplicated passage; covered positions
    are excised and the corpus keeps its copy. Batch-internal duplication
    is deliberately out of scope (that is the batch's own strip pass);
    the store side of every match is corpus-by-construction.

    Plan: new-batch window hashes build DOC-LOCALLY (text never
    shuffles); the store probe is one LEFT SEMI join carrying only
    (doc_id, s, h) rows against the hash-bucketed store; matched starts
    merge into per-doc intervals with the lag/running-sum island pass
    (one shuffle on doc_id — contiguous starts merge, overlapping
    intervals from gapped starts are fine, coverage is the
    exists-union); the excision join is doc_id-keyed against the
    batch-scaled interval frame (plain join — NOT force-broadcast; the
    r12 span-broadcast lesson) and the corpus never appears in the plan
    at all: its text was consumed once, when the store was written.
    Output: (doc_id, n_tokens, removed_tokens, clean_text), affected
    new docs only, unordered."""
    wins = token_window_hashes(new_batch, window)
    matched = wins.join(store.select("h"), "h", "semi").select("doc_id", "s")
    run_win = Window.partitionBy("doc_id").orderBy("s")
    marked = matched.withColumn(
        "new_run",
        F.when(
            F.lag("s").over(run_win).isNull()
            | ((F.col("s") - F.lag("s").over(run_win)) > 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("new_run").over(run_win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ivs = (
        marked.groupBy("doc_id", "run_id")
        .agg(
            F.struct(
                F.min("s").alias("st"),
                (F.max("s") + window).alias("en"),
            ).alias("iv")
        )
        .groupBy("doc_id")
        .agg(F.collect_list("iv").alias("ivs"))
    )
    return _excise_covered_positions(new_batch, ivs)


# _INCR_STRIP_ORACLE moved to ._span_shared (module-level dependency of
# store_maintenance's daily-cycle oracle; re-exported above).


@query("incremental_strip_spans", oracle=_INCR_STRIP_ORACLE)
def q_incremental_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span strip over the standard corpus/batch split
    (doc_id % 10 == 0 is the incoming batch — llm_dedup._split_batch's
    convention, mirrored in the oracle): the corpus' window-hash store is
    materialized ONCE (localCheckpoint stands in for the persisted store
    exactly as in incremental_minhash_near_dups), then the new batch is
    stripped against it. The final plan reads parquet only through the
    batch filter — the corpus contributes nothing but its checkpointed
    hash set (pinned by test_incremental_strip_never_rescans_corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.col("doc_id"), tokens_col().alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )
    corpus = toks.filter(F.col("doc_id") % 10 != 0)
    batch = toks.filter(F.col("doc_id") % 10 == 0)
    store = span_hash_store(corpus).localCheckpoint(eager=True)
    return incremental_strip_new_docs(batch, store).orderBy("doc_id")
