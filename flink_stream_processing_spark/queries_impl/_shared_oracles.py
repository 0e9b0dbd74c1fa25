"""Oracle SQL shared by a batch query and its streaming twin.

Deliberately import-free: query modules import from here at module top,
and this module imports nothing from the package — so it can never join
an import cycle. (The previous home of _CEP_ORACLE, analytics_extra,
made Python workers fail when unpickling that module's applyInPandas
functions: the worker's import entry point was analytics_extra itself,
whose ``from ..queries import query`` re-entered the registry's
alphabetical module loop and reached windows_extra's
``from .analytics_extra import _CEP_ORACLE`` while analytics_extra was
still partially initialized.)
"""

# CEP pattern view -> click -> purchase, relaxed contiguity, each step
# within 10 minutes — see analytics_extra.q_cep_funnel_sequences for the
# semantics discussion.
CEP_FUNNEL_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_type, event_id,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
  FROM events
), o2 AS (
  SELECT *,
         max(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                   AND ts - last_view <= INTERVAL 10 MINUTES THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_qual_click
  FROM o
), clicks AS (
  SELECT user_id, ts AS click_ts, max(last_view) AS view_ts
  FROM o WHERE event_type = 'click' AND last_view IS NOT NULL
           AND ts - last_view <= INTERVAL 10 MINUTES
  GROUP BY user_id, ts
)
SELECT p.user_id, p.event_id AS purchase_id,
       epoch_ms(c.view_ts)::BIGINT AS view_ms,
       epoch_ms(p.last_qual_click)::BIGINT AS click_ms,
       epoch_ms(p.ts)::BIGINT AS purchase_ms
FROM o2 p
JOIN clicks c ON p.user_id = c.user_id AND p.last_qual_click = c.click_ts
WHERE p.event_type = 'purchase' AND p.last_qual_click IS NOT NULL
  AND p.ts - p.last_qual_click <= INTERVAL 10 MINUTES
ORDER BY p.user_id, purchase_id
"""

# Per-user EWMA (alpha=0.2) as a recursive CTE — shared by the batch
# operator and its streaming GroupState twin.
EWMA_ORACLE = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), ew AS (
  SELECT user_id, event_id, rn, value, value AS ewma FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.rn, b.value, 0.2 * b.value + 0.8 * e.ewma
  FROM base b JOIN ew e ON b.user_id = e.user_id AND b.rn = e.rn + 1
)
SELECT user_id, event_id, round(value, 6) AS value, round(ewma, 6) AS ewma
FROM ew
ORDER BY user_id, event_id
"""

# Trailing-20-row out-of-sample z-score anomalies — shared by the batch
# window query and the streaming ring-buffer twin.
ZSCORE_ORACLE = """
WITH w AS (
  SELECT event_id, user_id, ts, value,
         avg(value)  OVER win AS mu,
         stddev_samp(value) OVER win AS sigma,
         count(*) OVER win AS n_prior
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, round(value, 6) AS value,
       round((value - mu) / sigma, 4) AS zscore
FROM w
WHERE n_prior = 20 AND sigma > 0 AND abs((value - mu) / sigma) > 2.5
ORDER BY event_id
"""

# --- shared across sibling modules (r12 extraction; see _shared_exprs's
# docstring for the import-order contract these leaf homes enforce) -------

# Exact word-3-gram Jaccard: the CTE chain shared by llm_dedup's exact
# top-k/threshold oracles and the recall oracles in llm_dedup2 /
# llm_pipeline5. DuckDB mirrors the same shingle construction as
# operators/dedup.word_shingles.
JACCARD_CTES = r"""
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
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""

# BM25 with Lucene idf ln(1 + (N - df + 0.5)/(df + 0.5)), k1=1.2, b=0.75;
# query = the token set of doc 0. Scores round to 4dp BEFORE ranking on
# both sides (cross-engine sum-order stability), ties break on doc_id.
# ``{k}`` placeholder: callers .format(k=...) the candidate depth (shared
# by retrieval's BM25 oracles and retrieval2's hybrid-RRF oracle).
BM25_CTE = """
t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
lens AS (SELECT doc_id, len(toks) AS dl FROM t),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
post AS (
  SELECT doc_id, dl, token, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM t)
  GROUP BY doc_id, dl, token
),
qterms AS (SELECT DISTINCT unnest(toks) AS token FROM t WHERE doc_id = 0),
matched AS (
  SELECT p.doc_id, p.dl, p.token, p.tf,
         CAST(count(*) OVER (PARTITION BY p.token) AS DOUBLE) AS df
  FROM post p JOIN qterms USING (token)
),
bm AS (
  SELECT doc_id,
         round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * 2.2
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
  FROM matched, stats
  GROUP BY doc_id
),
lex AS (
  SELECT doc_id, bm25,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
  FROM bm ORDER BY bm25 DESC, doc_id LIMIT {k}
)
"""

# (click, error) pairs for the same user within ±1 hour — shared by the
# batch interval join (temporal) and its stream-stream twin (windows_extra).
INTERVAL_ORACLE = """
SELECT c.event_id AS click_id, e.event_id AS error_id,
       c.user_id AS user_id, round(e.value, 6) AS error_value
FROM events c
JOIN events e
  ON c.user_id = e.user_id
 AND e.ts >= c.ts - INTERVAL 1 HOUR
 AND e.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND e.event_type = 'error'
ORDER BY click_id, error_id
"""
