"""Gates and laws for the r15-queued recrawl family (churn-modulated
recrawl + sessionized politeness). The two q_* functions are oracle-gated
HERE through the driver-equivalent assert_matches_oracle harness;
registration is deferred to r15 per the r14 zero-add-slot arithmetic
(OPERATORS.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_processing_spark.queries_impl.recrawl import (
    RECRAWL_SCHEDULE_ORACLE,
    SESSIONIZED_POLITENESS_ORACLE,
    _RECRAWL_MIN_DIVISOR,
    churn_recrawl_schedule,
    q_recrawl_schedule,
    q_sessionized_politeness,
)
from flink_stream_processing_spark.queries_impl.web_dedup_stream import (
    _POLITENESS_QUOTA,
    _POLITENESS_WINDOW_MS,
    politeness_schedule,
)

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle


# --- driver-equivalent oracle gates (the r15 registration contract) --------


def test_recrawl_schedule_matches_oracle(spark):
    assert_matches_oracle(
        q_recrawl_schedule(spark, SF_DIR), RECRAWL_SCHEDULE_ORACLE, SF_DIR
    )


def test_sessionized_politeness_matches_oracle(spark):
    assert_matches_oracle(
        q_sessionized_politeness(spark, SF_DIR), SESSIONIZED_POLITENESS_ORACLE, SF_DIR
    )


# --- pacing laws on synthetic frames ----------------------------------------


def _synthetic_inputs(spark, changes_by_host):
    """A 3-deep ranked frontier per host plus a per-host signal with the
    given change counts; last_window_start fixed so schedules compare
    across hosts directly."""
    ranked = spark.createDataFrame(
        [
            (h, f"https://{h}/p{r}", int(r * 100), int(r))
            for h in changes_by_host
            for r in (1, 2, 3)
        ],
        "host string, canonical_url string, priority long, rank long",
    )
    signal = spark.createDataFrame(
        [(h, 1_000_000, int(c)) for h, c in changes_by_host.items()],
        "host string, last_window_start long, n_changes long",
    )
    return ranked, signal


def test_recrawl_interval_monotone_in_churn_with_floor(spark):
    """More churn -> never a LONGER interval, and the politeness floor
    (window // divisor) is never breached no matter how hot the host."""
    ranked, signal = _synthetic_inputs(
        spark, {"calm": 0, "warm": 1, "hot": 5, "inferno": 10_000}
    )
    rows = {
        (r["host"], r["rank"]): r
        for r in churn_recrawl_schedule(ranked, signal).collect()
    }
    floor = _POLITENESS_WINDOW_MS // _RECRAWL_MIN_DIVISOR
    ordered = ["calm", "warm", "hot", "inferno"]
    for rank in (1, 2, 3):
        ivs = [rows[(h, rank)]["interval_ms"] for h in ordered]
        assert ivs == sorted(ivs, reverse=True), f"not monotone at rank {rank}: {ivs}"
        assert all(iv >= floor for iv in ivs)
        scheds = [rows[(h, rank)]["scheduled_start"] for h in ordered]
        assert scheds == sorted(scheds, reverse=True)
    assert rows[("calm", 1)]["interval_ms"] == _POLITENESS_WINDOW_MS
    assert rows[("inferno", 1)]["interval_ms"] == floor


def test_recrawl_with_zero_churn_reduces_to_politeness(spark):
    """n_changes == 0 must reproduce politeness_schedule exactly — the
    composition strictly extends the base controller, never forks it."""
    ranked, signal = _synthetic_inputs(spark, {"a": 0, "b": 0})
    base = politeness_schedule(
        ranked, signal.select("host", "last_window_start", F.lit(7).alias("observed_docs"))
    ).select("host", "canonical_url", "rank", "scheduled_start")
    got = churn_recrawl_schedule(ranked, signal).select(
        "host", "canonical_url", "rank", "scheduled_start"
    )
    assert sorted(got.collect()) == sorted(base.collect())


def test_recrawl_quota_law(spark):
    """At most _POLITENESS_QUOTA frontier entries share any (host,
    scheduled_start), and every schedule lands strictly after the host's
    last observed window."""
    ranked, signal = _synthetic_inputs(spark, {"x": 3, "y": 0})
    out = churn_recrawl_schedule(ranked, signal)
    per_slot = out.groupBy("host", "scheduled_start").count()
    assert per_slot.agg(F.max("count")).first()[0] <= _POLITENESS_QUOTA
    late = out.join(signal.select("host", "last_window_start"), "host").filter(
        F.col("scheduled_start") <= F.col("last_window_start")
    )
    assert late.count() == 0


def test_sessionized_schedule_starts_at_observed_idle(spark):
    """Every scheduled_start is >= the host's last session end (the
    instant the host is provably idle — session_end already includes the
    gap), rank 1..quota land exactly AT it, and at most quota entries
    share any (host, scheduled_start)."""
    out = q_sessionized_politeness(spark, SF_DIR).cache()
    try:
        assert out.count() > 0
        assert (
            out.filter(F.col("scheduled_start") < F.col("last_session_end")).count()
            == 0
        )
        first_slot = out.filter(F.col("rank") <= _POLITENESS_QUOTA)
        assert (
            first_slot.filter(
                F.col("scheduled_start") != F.col("last_session_end")
            ).count()
            == 0
        )
        per_slot = out.groupBy("host", "scheduled_start").count()
        assert per_slot.agg(F.max("count")).first()[0] <= _POLITENESS_QUOTA
    finally:
        out.unpersist(blocking=True)


# --- 100 TB plan pins ---------------------------------------------------------


def test_sessionized_politeness_never_reads_text(spark):
    """Neither the session islands nor the frontier need the text payload
    — every scan must prune it (the url_frontier_topk pin extended to the
    composition)."""
    from flink_stream_processing_spark.plans import formatted_plan

    plan = formatted_plan(q_sessionized_politeness(spark, SF_DIR))
    sections = plan.split("ReadSchema")[1:]
    assert sections, plan
    for section in sections:
        assert "text" not in section.split("\n", 1)[0], plan


def test_recrawl_reads_text_on_exactly_one_scan(spark):
    """Only the fingerprint observation scan may carry text; the frontier
    and window-anchor scans must prune it, and no join is force-broadcast
    (AQE owns the strategy — the r12 span-broadcast lesson)."""
    from flink_stream_processing_spark.plans import formatted_plan

    df = q_recrawl_schedule(spark, SF_DIR)
    plan = formatted_plan(df)
    sections = plan.split("ReadSchema")[1:]
    assert sections, plan
    text_scans = sum(
        "text" in section.split("\n", 1)[0] for section in sections
    )
    assert text_scans == 1, plan
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower(), logical


# --- robots overlay (r16 lookahead) -------------------------------------------


def test_robots_frontier_schedule_matches_oracle(spark):
    from flink_stream_processing_spark.queries_impl.recrawl import (
        ROBOTS_FRONTIER_SCHEDULE_ORACLE,
        q_robots_frontier_schedule,
    )

    assert_matches_oracle(
        q_robots_frontier_schedule(spark, SF_DIR),
        ROBOTS_FRONTIER_SCHEDULE_ORACLE,
        SF_DIR,
    )


def test_robots_laws(spark):
    """No disallowed URL is ever scheduled, ranks are dense per host
    AFTER the filter, consecutive ranks are spaced exactly crawl_delay_ms
    apart, delays sit on the 200 s grid, and the fixture actually
    exercises the filter (some host loses URLs)."""
    from flink_stream_processing_spark.queries_impl.recrawl import (
        _ROBOTS_DELAY_STEP_MS,
        q_robots_frontier_schedule,
        robots_rules,
    )

    rows = q_robots_frontier_schedule(spark, SF_DIR).collect()
    assert rows
    rules = {
        r["host"]: r
        for r in robots_rules(
            spark.createDataFrame(
                [(h,) for h in {r["host"] for r in rows}], "host string"
            )
        ).collect()
    }
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        rule = rules[r["host"]]
        path = r["canonical_url"].split(r["host"], 1)[1].split("?", 1)[0]
        if rule["disallow_prefix"] is not None:
            assert not path.startswith(rule["disallow_prefix"]), r
        assert r["crawl_delay_ms"] == rule["crawl_delay_ms"]
        assert r["crawl_delay_ms"] % _ROBOTS_DELAY_STEP_MS == 0
        assert 1 <= r["crawl_delay_ms"] // _ROBOTS_DELAY_STEP_MS <= 4
    for host, hr in by_host.items():
        hr.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in hr] == list(range(1, len(hr) + 1))
        for a, b in zip(hr, hr[1:]):
            assert b["scheduled_start"] - a["scheduled_start"] == a["crawl_delay_ms"]
    # the fixture must exercise the disallow branch: at least one host has
    # a non-null prefix (md5 classes over 20 hosts)
    assert any(r["disallow_prefix"] is not None for r in rules.values())


# --- change-rate estimator (r17 queue) ---------------------------------------


def test_change_rate_estimates_match_oracle(spark):
    from flink_stream_processing_spark.queries_impl.recrawl import (
        CHANGE_RATE_ESTIMATES_ORACLE,
        q_change_rate_estimates,
    )

    assert_matches_oracle(
        q_change_rate_estimates(spark, SF_DIR), CHANGE_RATE_ESTIMATES_ORACLE, SF_DIR
    )


def test_lambda_hat_laws(spark):
    """The estimator's exact arithmetic on a synthetic (n, X) grid: zero
    at X == 0 (the continuity corrections cancel), finite and positive
    at X == n (where the naive -ln(1 - X/n) diverges), strictly
    monotone in X for fixed n, and equal to the closed form
    -ln((n - X + 0.5)/(n + 0.5)) everywhere."""
    import math

    from flink_stream_processing_spark.queries_impl.recrawl import lambda_hat

    grid = [(n, x) for n in range(1, 8) for x in range(0, n + 1)]
    frame = spark.createDataFrame(grid, "n long, x long")
    rows = {
        (r["n"], r["x"]): r["lam"]
        for r in frame.select(
            "n", "x", lambda_hat(F.col("n"), F.col("x")).alias("lam")
        ).collect()
    }
    for (n, x), lam in rows.items():
        want = -math.log((n - x + 0.5) / (n + 0.5))
        assert abs(lam - want) < 1e-12, (n, x)
        if x == 0:
            assert lam == 0.0
        else:
            assert lam > rows[(n, x - 1)]  # strict monotonicity
        assert math.isfinite(lam)
