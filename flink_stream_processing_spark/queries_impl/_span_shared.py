"""Leaf constants shared by the web-crawl dedup/frontier family.

These single-source values are interpolated into BOTH the Spark plans
and the DuckDB oracle f-strings of ``web_dedup_stream``, ``recrawl``,
``store_maintenance`` and ``streaming_maintenance`` at module-import
time. They live in this dependency-free module (no pyspark, no
relative imports) so that registered modules can consume them while
``web_dedup_stream`` is itself mid-import: with ``recrawl`` and
``store_maintenance`` registered (r15), importing ``web_dedup_stream``
first triggers web_dedup_stream -> queries -> recrawl, and any
module-level attribute read on the partially initialized
``web_dedup_stream`` would raise ImportError (the r15 flip's circular
import). ``web_dedup_stream`` re-exports every name below, so external
importers and tests are unaffected.

Functions shared across the family (``_event_ts``, ``ranked_frontier``,
``span_hash_store``, ``documents_file_stream``) stay in
``web_dedup_stream`` — dependents bind the module object (safe
mid-cycle) and resolve the attribute at call time.
"""

# Synthetic deterministic event time shared by every streaming query in
# the family AND (as a literal, interpolated into the oracles) by the
# hot-hosts/recrawl time_buckets: the corpus has no crawl-time column,
# so event time is epoch + doc_id seconds. ONE definition — editing the
# epoch or the formula in one site but not the others would silently
# desynchronize a streaming query from its oracle.
_EVENT_EPOCH = 1_700_000_000

# Watermark horizon used by every streaming dedup in the family, in
# seconds. The no-late-drop precondition (streamed set == batch DISTINCT
# oracle) is that the synthetic event times span LESS than this horizon,
# i.e. max(doc_id) < _HORIZON_S. Enforced in-plan (r11 advice): a
# fixture grown past ~31.5M docs trips the named assertion in
# web_dedup_stream._event_ts instead of surfacing as an opaque gate
# hash-mismatch.
_HORIZON_S = 365 * 86_400
_HORIZON = f"{_HORIZON_S} seconds"  # the withWatermark string, same one definition

# Window length of the seed n-gram match. A shared run of L >= _SPAN_W
# tokens produces exactly L - _SPAN_W + 1 consecutive window matches on
# one (doc_a, doc_b, start_a - start_b) diagonal, so merging contiguous
# runs reconstructs maximal spans exactly.
_SPAN_W = 20

# New session when the per-host inter-arrival gap is >= 15 s (Spark's
# session window end is exclusive: an event exactly at last + gap starts
# a new session — same boundary convention as
# windows_extra._SESSION_ORACLE).
_HOST_SESSION_GAP_S = 15

# Per-host politeness quota: how many frontier fetches a host may absorb
# per pacing window. 2 splits the rank<=3 frontier into two schedule
# slots at every SF (rank 1-2 -> slot 1, rank 3 -> slot 2), so the gate
# exercises the pacing arithmetic, not just the join.
_POLITENESS_QUOTA = 2
# The pacing window width in ms — ONE definition interpolated into the
# Spark windowing, the oracle's time_bucket/arithmetic, and imported by
# the pacing tests (the quota-drift lesson applied to the width: editing
# it in one site but not the others would silently desynchronize the
# schedule from its oracle). 600 s also divides the 946 684 800 s offset
# between Spark's epoch window origin and DuckDB's 2000-01-01
# time_bucket origin, so the two engines' buckets coincide exactly.
_POLITENESS_WINDOW_MS = 600_000

# Deterministic frontier ranking, the oracle-side half of
# web_dedup_stream.ranked_frontier — composed over a `canon` CTE
# (URL_CANON_CTES) by url_frontier_topk, the politeness controller, and
# the recrawl/robots schedulers.
_FRONTIER_RANK_CTES = """u AS (SELECT DISTINCT canonical_url FROM canon),
r AS (
  SELECT regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host,
         canonical_url,
         ('0x' || substr(md5(canonical_url), 1, 8))::BIGINT AS priority
  FROM u
),
k AS (
  SELECT host, canonical_url, priority,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY priority, canonical_url) AS BIGINT)
           AS rank
  FROM r
)"""

# Window-hash CTEs (t/b/w/h): LOCK-STEP with token_window_hashes'
# convention (md5 of the space-joined W-token slice over the same
# interpolated _SPAN_W). Shared at module-import time by
# store_maintenance's compaction/daily-cycle/tombstone oracles AND
# streaming_maintenance's probe/takedown oracles — it moved here (r16)
# because streaming_maintenance, once REGISTERED, imports while
# store_maintenance can itself be mid-initialization (store_maintenance
# -> queries -> ... -> streaming_maintenance), the exact partial-init
# ImportError class this leaf exists to break.
_SPAN_WINDOW_CTES = rf"""t AS (
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
)"""

# The takedown-request slice convention (doc_id % 10 == 3), shared by the
# batch tombstone oracles (store_maintenance) and the streaming takedown
# oracle (streaming_maintenance) — one definition for the same reason.
_TOMBSTONE_RESIDUE = 3

# The IVF ingest-assignment oracle (write side of the ANN index) — one
# truth for BOTH the batch path (store_maintenance's ivf_store_append)
# and the streaming path (streaming_maintenance's prepared
# streaming_ivf_assign): the two engines and the two execution modes all
# pin to this string, so stream/batch divergence is structurally
# impossible. Lives in the leaf for the same partial-init reason as
# _SPAN_WINDOW_CTES above.
_IVF_ASSIGN_ORACLE = """
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
  SELECT b.vec_id, cl.label,
         list_dot_product(b.v, cl.cv)
           / (sqrt(list_dot_product(b.v, b.v))
              * sqrt(list_dot_product(cl.cv, cl.cv))) AS cos
  FROM batch b CROSS JOIN cl
),
pick AS (
  SELECT vec_id, label, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, label) AS rn
  FROM sims
)
SELECT vec_id, CAST(label AS INTEGER) AS assigned_label, round(cos, 5) AS sim
FROM pick WHERE rn = 1 ORDER BY vec_id
"""

# The incremental span-strip oracle (read side of the span store) — a
# pure SQL string over {_SPAN_W}; lives here because store_maintenance's
# daily-cycle oracle embeds it VERBATIM at module-import time.
_INCR_STRIP_ORACLE = rf"""
WITH t AS (
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
store AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 <> 0),
m AS (
  SELECT doc_id, s FROM h
  WHERE doc_id % 10 = 0 AND h IN (SELECT h FROM store)
),
i1 AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER win IS NULL OR s - lag(s) OVER win > 1
              THEN 1 ELSE 0 END AS new_run
  FROM m WINDOW win AS (PARTITION BY doc_id ORDER BY s)
),
i2 AS (
  SELECT doc_id, s,
         sum(new_run) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM i1
),
iv AS (SELECT doc_id, min(s) AS st, max(s) + {_SPAN_W} AS en
       FROM i2 GROUP BY doc_id, run_id),
aff AS (SELECT DISTINCT doc_id FROM iv),
poss AS (
  SELECT tb.doc_id, u.i AS pos, tb.toks[CAST(u.i AS INTEGER) + 1] AS tok
  FROM b tb JOIN aff USING (doc_id), UNNEST(range(0, len(tb.toks))) AS u(i)
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

# The per-doc quality-score oracle (operators/text.quality_score's DuckDB
# twin) — shared at module-import time by llm_text (quality_scores,
# which embeds it directly) and reputation (source_reputation_scores,
# whose oracle wraps it in a CTE). It moved here (r17) because
# reputation, once REGISTERED, imports while llm_text can itself be
# mid-initialization (llm_text -> queries -> ... -> reputation), the
# exact partial-init ImportError class this leaf exists to break.
_QUALITY_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_QUALITY_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         CAST(len({_QUALITY_TOKS}) AS DOUBLE) AS n_toks,
         CAST(len(list_filter({_QUALITY_TOKS},
              x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(list_sum(list_transform({_QUALITY_TOKS}, x -> length(x))) AS DOUBLE) AS sum_len
  FROM documents
)
SELECT doc_id,
       round(coalesce(n_punct / nullif(n_chars, 0), 0.0), 6) AS punct_ratio,
       round(coalesce(n_stop / nullif(n_toks, 0), 0.0), 6)  AS stopword_ratio,
       round(0.3 * least(n_toks / 100.0, 1.0)
             + 0.3 * (1.0 - coalesce(n_punct / nullif(n_chars, 0), 0.0))
             + 0.2 * coalesce(n_stop / nullif(n_toks, 0), 0.0)
             + 0.2 * least(coalesce(sum_len / nullif(n_toks, 0), 0.0) / 10.0, 1.0), 6) AS quality
FROM b
"""
