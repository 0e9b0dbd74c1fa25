"""Recrawl scheduling — the crawl family's freshness loop (r15 queue
items (a) and (c), prepared in r14).

Two compositions over signals the family already computes:

- ``recrawl_schedule``: politeness pacing MODULATED by content churn.
  Every document is one crawl observation of its canonical URL (event
  time = epoch + doc_id, web_dedup_stream's convention); consecutive
  observations of the SAME canonical URL whose content fingerprint
  differs are a detected change. Hosts whose pages churn get a SHORTER
  recrawl interval (window / (1 + changes), floored at window / 4 so a
  hot host can never be hammered), calm hosts keep the full politeness
  window — the classic freshness-driven scheduler (Cho & Garcia-Molina,
  "Effective Page Refresh Policies for Web Crawlers", TODS 2003).

- ``sessionized_politeness``: the frontier paced into the host's OBSERVED
  idle period. ``streaming_host_sessions`` (web_dedup_stream) groups each
  host's fetches into sessions separated by >= _HOST_SESSION_GAP_S of
  quiet; its batch twin here anchors the schedule at the LAST session's
  end (which already includes the gap — the host is provably idle from
  then) and drains the rank<=3 frontier quota-at-a-time from that anchor.

100 TB design: both queries aggregate the observation log to ONE row per
host before any join (change counts and window/session anchors are
per-host scalars; URLs never ride along), then join the rank<=3-per-host
frontier host-keyed — two narrow relations whose row count scales with
the number of hosts, not pages; AQE picks the join strategy (the r12
span-broadcast lesson: nothing here is force-broadcast). The per-URL
change-detection window shuffles (canonical_url, ts, fp) triples once —
no text, no all-pairs.

Registration state (r17): ``recrawl_schedule`` (r15),
``sessionized_politeness`` and ``robots_frontier_schedule`` (r16 flip),
and ``change_rate_estimates`` (r17 flip, its planned slot) are all
registered (``@query`` + queries.py import + QUERY_LEDGER.json rows);
all are additionally gated by tests/test_recrawl.py through the
driver-equivalent assert_matches_oracle harness.

Reference parity note: the reference (StreamJob.java) has no crawl
scheduler — this family is part of the LLM-pipeline extension's crawl
composition arc (OPERATORS.md r12-r15), built entirely on the public
politeness/recrawl literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries import query
from ..sources.batch import load_table
from ._shared_exprs import (
    URL_CANON_CTES as _URL_CANON_CTES,
    canonical_url_col,
    derived_url_col,
)
from ._span_shared import (
    _EVENT_EPOCH,
    _FRONTIER_RANK_CTES,
    _HOST_SESSION_GAP_S,
    _POLITENESS_QUOTA,
    _POLITENESS_WINDOW_MS,
)

# Module-object binding, not attribute imports: this module is REGISTERED
# (queries.py imports it), so when web_dedup_stream is the process's
# first import this module executes while web_dedup_stream is partially
# initialized — its functions (_event_ts, ranked_frontier) must resolve
# at call time, after the cycle unwinds (see _span_shared's docstring).
from . import web_dedup_stream as _wds

# A churny host's interval never drops below window / _RECRAWL_MIN_DIVISOR:
# change detection accelerates recrawl, it must never repeal politeness.
# ONE definition interpolated into the oracle and imported by the tests
# (the _POLITENESS_WINDOW_MS single-sourcing convention).
_RECRAWL_MIN_DIVISOR = 4


def _host_col() -> Column:
    return F.regexp_extract("canonical_url", r"^https://([^/?]+)", 1)


def churn_recrawl_schedule(
    ranked: DataFrame,
    host_signal: DataFrame,
    quota: int = _POLITENESS_QUOTA,
    window_ms: int = _POLITENESS_WINDOW_MS,
    min_divisor: int = _RECRAWL_MIN_DIVISOR,
) -> DataFrame:
    """The churn-modulated pacing join on frames (politeness_schedule's
    convention — law tests drive it over synthetic inputs): a ranked
    frontier joins a per-host signal (host, last_window_start, n_changes)
    and each entry is scheduled ceil(rank / quota) EFFECTIVE intervals
    after the host's last observed window, where the effective interval
    is window / (1 + n_changes) floored at window / min_divisor.

    LAWS (test-pinned): interval_ms is monotonically non-increasing in
    n_changes and never below window_ms // min_divisor; with n_changes
    = 0 the schedule is exactly ``politeness_schedule``'s. Unordered."""
    interval = F.greatest(
        F.floor(F.lit(window_ms) / (F.col("n_changes") + 1)).cast("long"),
        F.lit(window_ms // min_divisor).cast("long"),
    )
    slot = F.floor((F.col("rank") + quota - 1) / F.lit(quota)).cast("long")
    return ranked.join(host_signal, "host").select(
        "host",
        "canonical_url",
        "priority",
        "rank",
        "n_changes",
        interval.alias("interval_ms"),
        (F.col("last_window_start") + interval * slot)
        .cast("long")
        .alias("scheduled_start"),
    )


# --- planned registry name: recrawl_schedule --------------------------------

RECRAWL_SCHEDULE_ORACLE = f"""
WITH {_URL_CANON_CTES},
o AS (
  SELECT c.canonical_url,
         regexp_extract(c.canonical_url, '^https://([^/?]+)', 1) AS host,
         make_timestamp(({_EVENT_EPOCH} + c.doc_id) * 1000000) AS ts,
         md5(lower(trim(d.text))) AS fp
  FROM canon c JOIN documents d USING (doc_id)
),
tr AS (
  SELECT host,
         CASE WHEN lag(fp) OVER win IS NOT NULL AND fp <> lag(fp) OVER win
              THEN 1 ELSE 0 END AS chg
  FROM o WINDOW win AS (PARTITION BY canonical_url ORDER BY ts)
),
churn AS (SELECT host, CAST(sum(chg) AS BIGINT) AS n_changes FROM tr GROUP BY host),
w AS (
  SELECT epoch_ms(time_bucket(INTERVAL {_POLITENESS_WINDOW_MS // 1000} SECONDS, ts))
           AS window_start,
         host
  FROM o
),
hl AS (SELECT host, max(window_start) AS last_window_start FROM w GROUP BY host),
{_FRONTIER_RANK_CTES},
iv AS (
  SELECT host,
         CAST(greatest(floor({_POLITENESS_WINDOW_MS} / (n_changes + 1)),
                       {_POLITENESS_WINDOW_MS // _RECRAWL_MIN_DIVISOR})
              AS BIGINT) AS interval_ms,
         n_changes
  FROM churn
)
SELECT k.host, k.canonical_url, k.priority, k.rank, iv.n_changes, iv.interval_ms,
       CAST(hl.last_window_start
            + iv.interval_ms * CAST(floor((k.rank + {_POLITENESS_QUOTA} - 1)
                                          / {_POLITENESS_QUOTA}) AS BIGINT)
            AS BIGINT) AS scheduled_start
FROM k JOIN hl ON k.host = hl.host JOIN iv ON k.host = iv.host
WHERE k.rank <= 3
ORDER BY k.host, k.rank
"""


@query("recrawl_schedule", oracle=RECRAWL_SCHEDULE_ORACLE)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl schedule: politeness_frontier_schedule's
    composition with the per-host pacing window MODULATED by detected
    content churn. Change detection: per canonical URL ordered by event
    time (unique — ts is epoch + doc_id), a fingerprint differing from
    its predecessor counts one change; the host's change total divides
    its politeness window, floored at a quarter window. At this fixture
    nearly every revisit rewrites the page (synthetic text), so most
    hosts sit at the floor — the monotonicity and floor laws are pinned
    on synthetic frames in tests/test_recrawl.py, while this gate
    certifies the full composition arithmetic end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _wds._event_ts().alias("ts"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    wu = Window.partitionBy("canonical_url").orderBy("ts")
    chg = obs.withColumn(
        "chg",
        F.when(
            F.lag("fp").over(wu).isNotNull() & (F.col("fp") != F.lag("fp").over(wu)),
            1,
        ).otherwise(0),
    )
    churn = chg.groupBy(_host_col().alias("host")).agg(
        F.sum("chg").cast("long").alias("n_changes")
    )
    host_load = (
        obs.select(_host_col().alias("host"), "ts")
        .groupBy(F.window("ts", f"{_POLITENESS_WINDOW_MS // 1000} seconds"), "host")
        .agg(F.count(F.lit(1)))
        .groupBy("host")
        .agg(F.max(F.unix_millis(F.col("window.start"))).alias("last_window_start"))
    )
    ranked = _wds.ranked_frontier(obs.select("canonical_url").distinct())
    return churn_recrawl_schedule(ranked, host_load.join(churn, "host")).orderBy(
        "host", "rank"
    )


# --- registry name: sessionized_politeness (registered r16) ------------------

SESSIONIZED_POLITENESS_ORACLE = f"""
WITH {_URL_CANON_CTES},
tc AS (
  SELECT regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host,
         make_timestamp(({_EVENT_EPOCH} + doc_id) * 1000000) AS ts
  FROM canon
),
o AS (
  SELECT host, ts,
         CASE WHEN lag(ts) OVER win IS NULL
                OR ts - lag(ts) OVER win >= INTERVAL {_HOST_SESSION_GAP_S} SECONDS
              THEN 1 ELSE 0 END AS new_sess
  FROM tc WINDOW win AS (PARTITION BY host ORDER BY ts)
),
s AS (
  SELECT host, ts,
         sum(new_sess) OVER (PARTITION BY host ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
),
sess AS (
  SELECT host, sess_id,
         epoch_ms(max(ts)) + {_HOST_SESSION_GAP_S * 1000} AS session_end,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM s GROUP BY host, sess_id
),
anchor AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_sessions,
         max(session_end) AS last_session_end,
         max_by(n_docs, sess_id) AS last_session_docs
  FROM sess GROUP BY host
),
{_FRONTIER_RANK_CTES}
SELECT k.host, k.canonical_url, k.priority, k.rank,
       a.n_sessions, a.last_session_docs, a.last_session_end,
       CAST(a.last_session_end
            + {_POLITENESS_WINDOW_MS}
              * (CAST(floor((k.rank + {_POLITENESS_QUOTA} - 1)
                            / {_POLITENESS_QUOTA}) AS BIGINT) - 1)
            AS BIGINT) AS scheduled_start
FROM k JOIN anchor a ON k.host = a.host
WHERE k.rank <= 3
ORDER BY k.host, k.rank
"""


@query("sessionized_politeness", oracle=SESSIONIZED_POLITENESS_ORACLE)
def q_sessionized_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized politeness: the frontier drained into the host's
    observed IDLE period. The per-host session islands are the batch twin
    of ``streaming_host_sessions`` (same gap constant, same gaps-and-
    islands construction, same session_end = last fetch + gap convention
    — so the anchor is the instant the host is provably idle); the
    rank<=3 frontier schedules from the LAST session's end,
    _POLITENESS_QUOTA entries per politeness window. n_sessions and the
    last session's fetch count ride along so the gate certifies the whole
    islands computation, not just the anchor.

    Fixture honesty (the recrawl-gate convention): the synthetic feed's
    per-host arrival gaps are a constant 20 s — above the 15 s session
    gap — so at driver SFs every fetch is its own session (n_sessions ==
    per-host doc count, last_session_docs == 1). The gate still hash-pins
    the full islands arithmetic; non-trivial session shapes are pinned by
    streaming_host_sessions' own tests and the pacing laws in
    tests/test_recrawl.py."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _wds._event_ts().alias("ts"),
    )
    wh = Window.partitionBy("host").orderBy("ts")
    marked = (
        obs.select(_host_col().alias("host"), "ts")
        .withColumn(
            "new_sess",
            F.when(
                F.lag("ts").over(wh).isNull()
                | (
                    F.col("ts").cast("double") - F.lag("ts").over(wh).cast("double")
                    >= F.lit(float(_HOST_SESSION_GAP_S))
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(wh.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    sess = marked.groupBy("host", "sess_id").agg(
        (F.unix_millis(F.max("ts")) + _HOST_SESSION_GAP_S * 1000).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    anchor = sess.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("session_end").alias("last_session_end"),
        F.max_by("n_docs", "sess_id").alias("last_session_docs"),
    )
    slot = F.floor(
        (F.col("rank") + _POLITENESS_QUOTA - 1) / F.lit(_POLITENESS_QUOTA)
    ).cast("long")
    ranked = _wds.ranked_frontier(obs.select("canonical_url").distinct())
    return (
        ranked.join(anchor, "host")
        .select(
            "host",
            "canonical_url",
            "priority",
            "rank",
            "n_sessions",
            "last_session_docs",
            "last_session_end",
            (F.col("last_session_end") + _POLITENESS_WINDOW_MS * (slot - 1))
            .cast("long")
            .alias("scheduled_start"),
        )
        .orderBy("host", "rank")
    )


# --- registry name: robots_frontier_schedule (registered r16) ----------------

# Synthetic-but-deterministic robots.txt for the fixture's hosts (the
# derived_url_col convention: the corpus carries no robots data, so rules
# derive from the host string itself, byte-identically in both engines):
# a host's md5-derived class picks a disallowed language subtree (class 0
# -> /de/, class 1 -> /fr/, else none), and a second md5 nibble picks the
# Crawl-delay (200-800 s in 200 s steps — non-trivial spread so the
# pacing law bites). ONE definition, interpolated into the oracle.
_ROBOTS_DELAY_STEP_MS = 200_000


def robots_rules(hosts: DataFrame) -> DataFrame:
    """(host) -> (host, disallow_prefix nullable, crawl_delay_ms): the
    parsed-robots relation a crawler materializes per host. At 100 TB
    this is a genuine table fetched from each host; here it derives
    deterministically from the host string so the gate can recompute it."""
    cls = (
        F.conv(F.substring(F.md5("host"), 1, 4), 16, 10).cast("long") % 3
    )
    delay_cls = (
        F.conv(F.substring(F.md5("host"), 5, 4), 16, 10).cast("long") % 4
    )
    return hosts.select(
        "host",
        F.when(cls == 0, F.lit("/de/"))
        .when(cls == 1, F.lit("/fr/"))
        .alias("disallow_prefix"),
        ((delay_cls + 1) * _ROBOTS_DELAY_STEP_MS).cast("long").alias("crawl_delay_ms"),
    )


# Ranked-frontier clone over the robots-FILTERED url set. LOCK-STEP MIRROR
# of web_dedup_stream._FRONTIER_RANK_CTES with u replaced by the filtered
# set (ranking must run AFTER the filter — a crawler never spends a rank
# slot on a disallowed URL, so ranks stay dense per host); the priority
# and rank expressions must stay byte-identical to the original chain.
ROBOTS_FRONTIER_SCHEDULE_ORACLE = f"""
WITH {_URL_CANON_CTES},
cu AS (
  SELECT DISTINCT canonical_url,
         regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host,
         regexp_extract(canonical_url, '^https://[^/?]+([^?]*)', 1) AS path
  FROM canon
),
rr AS (
  SELECT host,
         CASE ('0x' || substr(md5(host), 1, 4))::BIGINT % 3
           WHEN 0 THEN '/de/' WHEN 1 THEN '/fr/' END AS disallow_prefix,
         (('0x' || substr(md5(host), 5, 4))::BIGINT % 4 + 1)
           * {_ROBOTS_DELAY_STEP_MS} AS crawl_delay_ms
  FROM (SELECT DISTINCT host FROM cu)
),
allowed AS (
  SELECT cu.host, cu.canonical_url, rr.crawl_delay_ms
  FROM cu JOIN rr ON cu.host = rr.host
  WHERE rr.disallow_prefix IS NULL
     OR NOT starts_with(cu.path, rr.disallow_prefix)
),
rk AS (
  SELECT host, canonical_url, crawl_delay_ms,
         ('0x' || substr(md5(canonical_url), 1, 8))::BIGINT AS priority
  FROM allowed
),
k2 AS (
  SELECT host, canonical_url, priority, crawl_delay_ms,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY priority, canonical_url) AS BIGINT)
           AS rank
  FROM rk
),
tc AS (
  SELECT regexp_extract(canonical_url, '^https://([^/?]+)', 1) AS host,
         make_timestamp(({_EVENT_EPOCH} + doc_id) * 1000000) AS ts
  FROM canon
),
w AS (
  SELECT epoch_ms(time_bucket(INTERVAL {_POLITENESS_WINDOW_MS // 1000} SECONDS, ts))
           AS window_start,
         host
  FROM tc
),
hl AS (SELECT host, max(window_start) AS last_window_start FROM w GROUP BY host)
SELECT k2.host, k2.canonical_url, k2.priority, k2.rank,
       CAST(k2.crawl_delay_ms AS BIGINT) AS crawl_delay_ms,
       CAST(hl.last_window_start + k2.crawl_delay_ms * k2.rank AS BIGINT)
         AS scheduled_start
FROM k2 JOIN hl ON k2.host = hl.host
WHERE k2.rank <= 3
ORDER BY k2.host, k2.rank
"""


@query("robots_frontier_schedule", oracle=ROBOTS_FRONTIER_SCHEDULE_ORACLE)
def q_robots_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-aware frontier schedule: disallowed subtrees are filtered
    BEFORE ranking (a crawler never spends a rank slot on a URL it may
    not fetch — ranks stay dense per host, the re-rank-after-filter
    subtlety this gate exists to pin), then each host's next <=3 allowed
    URLs are paced by its OWN Crawl-delay: fetch k lands
    k * crawl_delay_ms after the host's last observed window — the
    per-fetch spacing semantics of robots Crawl-delay, vs the
    quota-per-window semantics of the politeness controller.

    Plan (100 TB): the robots relation is one row per host (a real table
    in production, derived here); the filter is a host-keyed join +
    prefix test BEFORE the rank window, so disallowed URLs never reach
    the shuffle; ranking reuses ``ranked_frontier`` unchanged on the
    filtered set; the pacing join is per-host scalars, AQE-owned."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _wds._event_ts().alias("ts"),
    )
    urls = obs.select("canonical_url").distinct().select(
        "canonical_url",
        _host_col().alias("host"),
        F.regexp_extract("canonical_url", r"^https://[^/?]+([^?]*)", 1).alias("path"),
    )
    rules = robots_rules(urls.select("host").distinct())
    allowed = urls.join(rules, "host").filter(
        F.col("disallow_prefix").isNull()
        | ~F.col("path").startswith(F.col("disallow_prefix"))
    )
    ranked = _wds.ranked_frontier(allowed.select("canonical_url").distinct())
    host_load = (
        obs.select(_host_col().alias("host"), "ts")
        .groupBy(F.window("ts", f"{_POLITENESS_WINDOW_MS // 1000} seconds"), "host")
        .agg(F.count(F.lit(1)))
        .groupBy("host")
        .agg(F.max(F.unix_millis(F.col("window.start"))).alias("last_window_start"))
    )
    return (
        ranked.join(rules.select("host", "crawl_delay_ms"), "host")
        .join(host_load, "host")
        .select(
            "host",
            "canonical_url",
            "priority",
            "rank",
            "crawl_delay_ms",
            (F.col("last_window_start") + F.col("crawl_delay_ms") * F.col("rank"))
            .cast("long")
            .alias("scheduled_start"),
        )
        .orderBy("host", "rank")
    )


# --- registry name: change_rate_estimates (registered in the r17 flip) -------
# The statistical upgrade on churn counting: raw change counts
# under-estimate how often a page REALLY changes (two changes between
# visits look like one), so the freshness literature's standard fix is
# the bias-corrected Poisson-rate estimator of Cho & Garcia-Molina
# ("Estimating Frequency of Change", ACM TOIT 3(3), 2003, §4.1):
#
#     lambda_hat = -ln((n - X + 0.5) / (n + 0.5))
#
# over n = observation INTERVALS (visits - 1) and X = intervals that
# showed a change. The +0.5 continuity correction keeps the estimator
# finite at X == n (every visit changed) and exactly 0 at X == 0 —
# both law-pinned. Observations reuse the recrawl_schedule conventions
# verbatim: one crawl observation per document of its canonical URL,
# event time = epoch + doc_id, change = consecutive fingerprint differs.
#
# 100 TB design: the per-URL (n, X) pairs reduce from the observation
# log in one window pass + one aggregate (the same shuffle
# recrawl_schedule already pays — (canonical_url, ts, fp) triples, no
# text); hosts then aggregate O(urls) narrow rows. ln() runs on
# identical rational inputs in both engines (IEEE double, rounded to 6).

CHANGE_RATE_ESTIMATES_ORACLE = f"""
WITH {_URL_CANON_CTES},
o AS (
  SELECT c.canonical_url,
         regexp_extract(c.canonical_url, '^https://([^/?]+)', 1) AS host,
         make_timestamp(({_EVENT_EPOCH} + c.doc_id) * 1000000) AS ts,
         md5(lower(trim(d.text))) AS fp
  FROM canon c JOIN documents d USING (doc_id)
),
tr AS (
  SELECT canonical_url, host,
         CASE WHEN lag(fp) OVER win IS NULL THEN NULL
              WHEN fp <> lag(fp) OVER win THEN 1 ELSE 0 END AS chg
  FROM o WINDOW win AS (PARTITION BY canonical_url ORDER BY ts)
),
per_url AS (
  SELECT canonical_url, host,
         CAST(count(chg) AS BIGINT) AS n_intervals,
         CAST(coalesce(sum(chg), 0) AS BIGINT) AS n_changed
  FROM tr GROUP BY canonical_url, host
),
est AS (
  SELECT host, canonical_url, n_intervals, n_changed,
         -ln((n_intervals - n_changed + 0.5) / (n_intervals + 0.5))
           AS lambda_hat
  FROM per_url WHERE n_intervals >= 1
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(n_changed) AS BIGINT) AS n_changed,
       round(avg(lambda_hat), 6) AS avg_lambda,
       round(max(lambda_hat), 6) AS max_lambda
FROM est GROUP BY host ORDER BY host
"""


def lambda_hat(n_intervals: Column, n_changed: Column) -> Column:
    """Cho & Garcia-Molina bias-corrected change-rate estimator (changes
    per observation interval). LAWS (test-pinned): exactly 0 at
    n_changed == 0, finite at n_changed == n_intervals, strictly
    monotone in n_changed for fixed n_intervals."""
    return -F.log(
        (n_intervals - n_changed + F.lit(0.5)) / (n_intervals + F.lit(0.5))
    )


@query("change_rate_estimates", oracle=CHANGE_RATE_ESTIMATES_ORACLE)
def q_change_rate_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host change-rate profile of the crawl observation log: URL
    count, interval/change totals, and the mean and max bias-corrected
    lambda_hat across the host's URLs — the statistic a
    freshness-optimal scheduler consumes instead of raw churn counts
    (recrawl_schedule's n_changes is the X in this estimator)."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.select(
        canonical_url_col(derived_url_col()).alias("canonical_url"),
        _wds._event_ts().alias("ts"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    wu = Window.partitionBy("canonical_url").orderBy("ts")
    chg = obs.withColumn(
        "chg",
        F.when(F.lag("fp").over(wu).isNull(), F.lit(None).cast("int")).otherwise(
            (F.col("fp") != F.lag("fp").over(wu)).cast("int")
        ),
    )
    per_url = (
        chg.groupBy("canonical_url", _host_col().alias("host"))
        .agg(
            F.count("chg").cast("long").alias("n_intervals"),
            F.coalesce(F.sum("chg"), F.lit(0)).cast("long").alias("n_changed"),
        )
        .filter(F.col("n_intervals") >= 1)
        .withColumn(
            "lambda_hat", lambda_hat(F.col("n_intervals"), F.col("n_changed"))
        )
    )
    return (
        per_url.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("n_intervals").cast("long").alias("n_intervals"),
            F.sum("n_changed").cast("long").alias("n_changed"),
            F.round(F.avg("lambda_hat"), 6).alias("avg_lambda"),
            F.round(F.max("lambda_hat"), 6).alias("max_lambda"),
        )
        .orderBy("host")
    )
