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
