"""Spark expression builders + oracle fragments shared ACROSS queries_impl
modules (r12 extraction; r11 verdict What's-wrong #1).

IMPORT-ORDER CONTRACT: like ``_shared_oracles`` and ``_stream_helpers``,
this module must NEVER import ``..queries`` (or any sibling that does).
``queries.py`` imports every queries_impl module alphabetically, so a
shared name defined in a registry-importing module crashes any process
whose first package import is that provider module: the provider's
``from ..queries import query`` fans out to ALL siblings, and the
consumer sibling then reads the shared name from the still-partially-
initialized provider. The r12 import-isolation gate
(``tests/test_import_isolation.py``) found six such latent providers
(llm_dedup, llm_similarity, reference_parity, retrieval, retrieval2,
temporal); everything they shared now lives in the three ``_``-prefixed
leaf modules, which ``..operators``/``..sources`` may back but the
registry never touches. SQL-only constants go to ``_shared_oracles``
(strictly import-free); anything needing pyspark or the operators layer
goes here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.window_metrics import EVENT_TYPE_RATES
from ..sources.batch import load_table

# --- flagship window-metrics oracle (provider: reference_parity) ---------

# Shared CASE fragment: event_type -> exchange rate (mirrors
# RemittanceGenerator.java:65-74's currency map; 'error' is the CNY-style
# zero-rate poison).
RATE_CASE_SQL = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN {v!r}" for k, v in EVENT_TYPE_RATES.items())
    + " ELSE 1.0 END"
)

WINDOW_METRICS_ORACLE = f"""
WITH tx AS (
  SELECT value AS amount, {RATE_CASE_SQL} AS rate, ts FROM events
)
SELECT
  epoch_ms(time_bucket(INTERVAL 10 SECONDS, ts)) AS window_start,
  epoch_ms(time_bucket(INTERVAL 10 SECONDS, ts)) + 10000 AS window_end,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
  CAST(sum(CASE WHEN rate <> 0 THEN 0 ELSE 1 END) AS BIGINT) AS failure_count,
  round(coalesce(sum(CASE WHEN rate <> 0 THEN amount END)
        / nullif(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END), 0), 0.0), 6) AS avg_amount,
  round(coalesce(sum(CASE WHEN rate <> 0 THEN rate END)
        / nullif(sum(CASE WHEN rate <> 0 THEN 1 ELSE 0 END), 0), 0.0), 6) AS avg_exchange_rate,
  coalesce(min(CASE WHEN rate <> 0 THEN amount END), 0.0) AS min_amount,
  coalesce(max(CASE WHEN rate <> 0 THEN amount END), 0.0) AS max_amount
FROM tx
GROUP BY 1
"""

# --- embedding query vector (provider: llm_similarity) -------------------


def query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query vector: embedding of vec_id 0 (deterministic lookup; a
    single-row collect, not a driver-side loop)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


# --- URL derivation + canonicalization (provider: retrieval2) ------------

# Deterministic messy-URL derivation shared (textually) by the Spark query
# and the oracle — four variants per page identity (source, lang,
# doc_id % 10): mixed-case scheme/host + default port + utm param +
# fragment; plain https + www; http + :80 + /index.html + trailing utm
# param; https + trailing slash + NO query (stays a distinct canonical —
# ?id=N pages and query-less pages must not collapse).
URL_DERIVE_SQL = """
  CASE CAST(doc_id % 4 AS INTEGER)
    WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/' || lang
                || '/page' || CAST(doc_id % 10 AS VARCHAR)
                || '/?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
                || '#frag'
    WHEN 1 THEN 'https://www.' || source || '.example.com/' || lang
                || '/page' || CAST(doc_id % 10 AS VARCHAR)
                || '?id=' || CAST(doc_id % 10 AS VARCHAR)
    WHEN 2 THEN 'http://' || source || '.example.com:80/' || lang
                || '/page' || CAST(doc_id % 10 AS VARCHAR)
                || '/index.html?id=' || CAST(doc_id % 10 AS VARCHAR)
                || '&utm_campaign=x'
    ELSE 'https://' || source || '.example.com/' || lang
         || '/page' || CAST(doc_id % 10 AS VARCHAR) || '/'
  END
"""

# Shared canonicalization CTE chain (derive messy url -> strip fragment ->
# host/path/query normalization -> canonical_url). Composed — not pasted —
# by retrieval2's dedup oracle AND web_dedup_stream's streaming-twin
# oracle, so the two gates can never diverge on the normalizer.
URL_CANON_CTES = f"""raw AS (SELECT doc_id, {URL_DERIVE_SQL} AS url FROM documents),
defrag AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
parts AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             lower(regexp_extract(u, '^(?i)[a-z]+://([^/?#]+)', 1)),
             ':(80|443)$', ''),
           '^www\\.', '') AS host,
         regexp_replace(
           regexp_replace(
             regexp_extract(u, '^(?i)[a-z]+://[^/?#]+([^?]*)', 1),
             '/index\\.html$', ''),
           '/+$', '') AS path,
         coalesce(array_to_string(
           list_sort(list_filter(
             string_split(regexp_extract(u, '\\?(.*)$', 1), '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') AS qn
  FROM defrag
),
canon AS (
  SELECT doc_id,
         'https://' || host || path
         || CASE WHEN qn = '' THEN '' ELSE '?' || qn END AS canonical_url
  FROM parts
)"""


def derived_url_col():
    """The deterministic messy-URL derivation (Spark twin of
    ``URL_DERIVE_SQL``) as a Column over (doc_id, source, lang) — shared
    by retrieval2's batch dedup and web_dedup_stream's streaming twin so
    both queries derive byte-identical raw URLs."""
    page = (F.col("doc_id") % 10).cast("string")
    return (
        F.when(
            (F.col("doc_id") % 4) == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"),
                F.lit(".Example.COM:443/"), F.col("lang"),
                F.lit("/page"), page,
                F.lit("/?utm_source=feed&id="), page, F.lit("#frag"),
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 1,
            F.concat(
                F.lit("https://www."), F.col("source"),
                F.lit(".example.com/"), F.col("lang"),
                F.lit("/page"), page, F.lit("?id="), page,
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 2,
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".example.com:80/"), F.col("lang"),
                F.lit("/page"), page,
                F.lit("/index.html?id="), page, F.lit("&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/"), F.col("lang"),
                F.lit("/page"), page, F.lit("/"),
            )
        )
    )


def canonical_url_col(raw):
    """Canonicalize a raw URL Column (Spark twin of the ``URL_CANON_CTES``
    normalization): strip fragment; lowercase host; drop default ports and
    a leading ``www.``; scheme to https; strip ``/index.html`` and trailing
    slashes; drop ``utm_*`` params and sort the survivors. Pure JVM
    regex/array expressions — one whole-stage-codegen projection, usable
    identically in batch and streaming plans."""
    u = F.regexp_replace(raw, "#.*$", "")
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(u, r"^(?i)[a-z]+://([^/?#]+)", 1)),
            ":(80|443)$", "",
        ),
        r"^www\.", "",
    )
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(u, r"^(?i)[a-z]+://[^/?#]+([^?]*)", 1),
            r"/index\.html$", "",
        ),
        "/+$", "",
    )
    qn = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(u, r"\?(.*)$", 1), "&"),
                lambda x: (x != "") & ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"), host, path,
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)),
    )
